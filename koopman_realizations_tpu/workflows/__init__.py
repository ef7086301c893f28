from koopman_realizations_tpu.workflows.rand_models import evaluate_rand_models  # noqa: F401
