from .search import (
    ASHAScheduler,
    PBTScheduler,
    StopTrial,
    Trial,
    choice,
    get_best_result,
    loguniform,
    run_search,
    sample_config,
    uniform,
)
