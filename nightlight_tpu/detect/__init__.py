"""Star detection on device: fixed-capacity candidate arrays with validity
masks instead of dynamic lists."""
