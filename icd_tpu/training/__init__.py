from . import baseline  # noqa: F401
from .common import (  # noqa: F401
    cross_entropy, doubly_stochastic_regularizer, make_optimizer, merge,
    partition)
