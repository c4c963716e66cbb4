from avr_tpu.data.loaders import Dataset, load_dataset  # noqa: F401
from avr_tpu.data.sampler import BatchSampler  # noqa: F401
