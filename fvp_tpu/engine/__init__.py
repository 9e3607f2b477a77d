from fvp_tpu.engine.train import TrainState, create_train_state, make_train_step  # noqa: F401
from fvp_tpu.engine.validate import make_eval_step, run_validation  # noqa: F401
from fvp_tpu.engine.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
