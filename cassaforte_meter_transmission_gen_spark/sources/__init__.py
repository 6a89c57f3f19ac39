from .meter_generator import transmissions, meter_samples_second  # noqa: F401
