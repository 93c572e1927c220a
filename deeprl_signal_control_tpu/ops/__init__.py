from .initializers import ortho_init
from .layers import fc_init, fc_apply, lstm_init, lstm_step, lstm_scan
from .returns import nstep_returns
from .replay import (
    ReplayState,
    replay_init,
    replay_add,
    replay_add_many,
    replay_sample,
)
from .schedules import Scheduler
