from petr_tpu.train.losses import petr_set_loss
from petr_tpu.train.optim import build_optimizer, make_lr_schedule
from petr_tpu.train.train_step import TrainState, create_train_state, make_train_step, make_eval_step
