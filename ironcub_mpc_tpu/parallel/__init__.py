from .mesh import make_mesh, scenario_sharding  # noqa: F401
from .pp_pipeline import pipeline_tick  # noqa: F401
from .monte_carlo import (  # noqa: F401
    STATUS_COLS,
    ScenarioConfig,
    SweepResult,
    make_batched_carry,
    recovery_settings,
    run_sweep,
)
