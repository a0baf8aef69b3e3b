from .profiling import annotate, maybe_profile  # noqa: F401
