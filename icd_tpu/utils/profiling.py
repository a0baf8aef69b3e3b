"""Profiling hooks.

The reference's only observability was wall-clock prints (SURVEY §5);
here training/eval drivers run under an optional ``jax.profiler`` trace:
set ``ICD_TPU_PROFILE=/path/to/dir`` and every driver invocation writes
a TensorBoard-loadable trace there. ``annotate`` adds named spans.
"""

import contextlib
import os


@contextlib.contextmanager
def maybe_profile(name="trace"):
    """Trace into $ICD_TPU_PROFILE/<name> when the env var is set."""
    target = os.environ.get("ICD_TPU_PROFILE")
    if not target:
        yield
        return
    import jax

    out_dir = os.path.join(target, name)
    os.makedirs(out_dir, exist_ok=True)
    with jax.profiler.trace(out_dir):
        yield
    print("Wrote profiler trace to {}".format(out_dir))


def annotate(name):
    """Named trace span context manager (no-op overhead when idle)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
