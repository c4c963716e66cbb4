from avr_tpu.hpo.study import Study, Trial, create_study  # noqa: F401
