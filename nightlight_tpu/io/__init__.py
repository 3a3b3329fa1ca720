"""Host-side image I/O: FITS read/write, TIFF16 and JPEG export, and the
async ingest pipeline that feeds decoded frames to the device."""
