from avr_tpu.models import field, hashgrid, mlp  # noqa: F401
