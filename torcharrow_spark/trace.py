"""Trace / replay for engine pipelines (reference torcharrow/trace.py:16-129).

The reference records every API call on traced types as (id, expression)
pairs and can emit replayable statements. Here the lazy Spark plan
already IS a full trace of the *computation* (`df.explain()`); what this
module adds is the reference's other use-case — capturing the sequence
of ENGINE API CALLS so the same pipeline can be re-applied to different
input data (rerun yesterday's curation recipe on today's shard).

Design: a recording proxy, not a global tape. ``trace(df)`` wraps a
DataFrame facade; every method call that returns a new DataFrame is
recorded as a :class:`TraceStep` holding the live argument objects
(me-expressions, callables, literals) and the result is wrapped again,
so fluent chains record end to end. ``replay(steps, other_df)``
re-applies the recorded calls to any compatible frame. Steps carry real
objects instead of source strings — replay is exact (no repr/eval
round-trip) and works with lambdas and me-expressions alike.
"""

from __future__ import annotations

import typing as _ty
from dataclasses import dataclass, field

from .frame import DataFrame


@dataclass
class TraceStep:
    method: str
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)

    def render(self, var: str = "t") -> str:
        """Human-readable (not eval-able — args render via repr) form."""
        parts = [repr(a) for a in self.args] + [
            f"{k}={v!r}" for k, v in self.kwargs.items()
        ]
        return f"{var} = {var}.{self.method}({', '.join(parts)})"


class TracedFrame:
    """Recording proxy over a :class:`DataFrame` facade. Methods that
    return a DataFrame are recorded and re-wrapped (the chain stays
    traced); anything else (collect, schema, to_pandas, aggregates)
    passes through un-recorded — those are sinks, not pipeline steps."""

    def __init__(self, target: DataFrame, steps: _ty.List[TraceStep] | None = None):
        object.__setattr__(self, "_target", target)
        object.__setattr__(self, "_steps", steps if steps is not None else [])

    # -- recording ---------------------------------------------------------
    @property
    def steps(self) -> _ty.List[TraceStep]:
        return list(self._steps)

    def statements(self, var: str = "t") -> _ty.List[str]:
        return [s.render(var) for s in self._steps]

    def result(self) -> DataFrame:
        """The underlying (fully-applied) frame."""
        return self._target

    # -- delegation --------------------------------------------------------
    def __getattr__(self, name: str):
        attr = getattr(self._target, name)
        if not callable(attr):
            return attr

        def recorded(*args, **kwargs):
            out = attr(*args, **kwargs)
            if isinstance(out, DataFrame):
                step = TraceStep(name, args, kwargs)
                return TracedFrame(out, self._steps + [step])
            return out

        return recorded

    def __getitem__(self, key):
        out = self._target[key]
        if isinstance(out, DataFrame):
            return TracedFrame(
                out, self._steps + [TraceStep("__getitem__", (key,))]
            )
        return out

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"TracedFrame({len(self._steps)} steps)"


def trace(df: DataFrame) -> TracedFrame:
    """Start recording API calls on ``df``."""
    return TracedFrame(df)


def replay(
    steps: _ty.Sequence[TraceStep], df: DataFrame
) -> DataFrame:
    """Re-apply a recorded pipeline to a (new) input frame — the
    reference's replay semantics, minus the string round-trip."""
    cur: _ty.Any = df
    for s in steps:
        if s.method == "__getitem__":
            cur = cur[s.args[0]]
        else:
            cur = getattr(cur, s.method)(*s.args, **s.kwargs)
    return cur
