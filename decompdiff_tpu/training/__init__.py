from decompdiff_tpu.training.train_step import (
    TrainState, create_train_state, make_train_step, make_eval_step,
    PlateauScheduler, get_learning_rate, set_learning_rate)
