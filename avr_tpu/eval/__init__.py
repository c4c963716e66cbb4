from avr_tpu.eval import doa  # noqa: F401
