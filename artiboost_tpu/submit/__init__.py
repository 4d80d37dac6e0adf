from artiboost_tpu.submit.epoch_pass import HOSubmitEpochPass, SubmitEpochPass  # noqa: F401
