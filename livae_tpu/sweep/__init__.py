from .search import (
    ASHAScheduler,
    PBTScheduler,
    RandomSearcher,
    StopTrial,
    TPESearcher,
    Trial,
    choice,
    get_best_result,
    loguniform,
    run_search,
    sample_config,
    uniform,
)
