from . import kafka_shape  # noqa: F401
