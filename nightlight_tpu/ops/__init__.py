"""Jitted XLA/Pallas compute kernels: statistics, calibration, stacking,
stretching, and color math. All functions here are pure and operate on
device-resident arrays; host-side orchestration lives in nightlight_tpu.pipeline.
"""
