from artiboost_tpu.artiboost.loader import ArtiBoostLoader  # noqa: F401
