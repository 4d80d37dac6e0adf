import artiboost_tpu.metrics.lossesmetric  # noqa: F401
import artiboost_tpu.metrics.meanepe  # noqa: F401
import artiboost_tpu.metrics.pckmetric  # noqa: F401
import artiboost_tpu.metrics.val_metric  # noqa: F401
import artiboost_tpu.metrics.bop_ar  # noqa: F401
import artiboost_tpu.metrics.vismetric  # noqa: F401

from artiboost_tpu.metrics.evaluator import Evaluator, build_evaluator  # noqa: F401
from artiboost_tpu.metrics.metric import AverageMeter, Metric  # noqa: F401
