from . import (  # noqa: F401
    backward_search,
    base_all_pair,
    fora,
    forward_push,
    metrics,
    monte_carlo,
    pagerank,
    power_method,
    topk,
)
