from .integrate import ODESolution, odeint_fixed, odeint_grid
from .runge_kutta import STEPPERS, Dopri5, Kvaerno3
from .schedule import calibrate_substeps, schedule_cost
from .sde import SDESolution, sdeint_fixed

__all__ = ["ODESolution", "odeint_grid", "odeint_fixed",
           "STEPPERS", "Dopri5", "Kvaerno3",
           "calibrate_substeps", "schedule_cost",
           "SDESolution", "sdeint_fixed"]
