from .greedy import greedy_decode_baseline  # noqa: F401
