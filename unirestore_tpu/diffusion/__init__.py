from .schedules import (  # noqa: F401
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
    make_schedule,
    predict_x0_from_eps,
)
