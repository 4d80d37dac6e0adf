from artiboost_tpu.postprocess.fitting import FittingUnit  # noqa: F401
from artiboost_tpu.postprocess.iknet import IKNet  # noqa: F401
