"""Observer registry (reference: sparsebit/quantization/observers/__init__.py:4-21)."""

OBSERVERS_MAP = {}


def register_observer(observer_cls):
    OBSERVERS_MAP[observer_cls.TYPE.lower()] = observer_cls
    return observer_cls


from sparsebit_tpu.quantization.observers.base import Observer, DataCache  # noqa: E402
from sparsebit_tpu.quantization.observers import (  # noqa: E402,F401
    minmax,
    mse,
    percentile,
    moving_average,
    aciq,
    kl_histogram,
)


def build_observer(config, qdesc):
    observer_type = config.OBSERVER.TYPE.lower()
    assert observer_type in OBSERVERS_MAP, "no observer named {}".format(observer_type)
    return OBSERVERS_MAP[observer_type](config, qdesc)
