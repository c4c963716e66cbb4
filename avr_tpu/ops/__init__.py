from avr_tpu.ops import stft  # noqa: F401  (module, not the function)
