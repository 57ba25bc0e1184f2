from .train_step import (TrainState, create_mesh,  # noqa: F401
                         create_train_state, make_eval_step,
                         make_train_step)
