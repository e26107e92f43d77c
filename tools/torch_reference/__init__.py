"""Clean-room torch re-implementations of the reference architectures.

These exist for two purposes only (never in the TPU runtime path):
  1. golden-parity tests: generate activations to validate the flax models
     and the weight-porting code (SURVEY.md §4b),
  2. baseline measurement: time the reference-style torch-CPU pipeline that
     bench.py compares against (BASELINE.md: the reference publishes no
     numbers, so the baseline must be measured).
"""
