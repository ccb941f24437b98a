from .stacked import (
    make_stacked_fns,
    run_search_stacked,
    set_stacked_hyperparams,
    stack_trees,
    unstack_tree,
)
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
