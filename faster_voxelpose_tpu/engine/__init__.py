from .trainer import AverageMeter, TrainState, create_train_state, make_train_step
from .validator import make_eval_step, run_validation
