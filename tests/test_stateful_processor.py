"""Unit-level verification of the transformWithStateInPandas processor.

The container lacks google.protobuf, so stream_transform_with_state
(streaming/queries.py) runs its documented applyInPandasWithState
fallback here and the real state-server path cannot run. These tests
exercise the SAME UserTotals class the query submits where protobuf
exists — init, per-key micro-batch handling, state carry-over
across batches, and close — against a fake StatefulProcessorHandle,
plus the pure accumulate_totals fold against a pandas-computed batch
answer. No Spark session involved: the processor contract is
(key, iterator-of-pandas, state) → pandas, which is fully drivable
from plain Python.
"""

from __future__ import annotations

import pandas as pd

from linux_logs_spark.streaming.queries import _make_user_totals, accumulate_totals


class FakeValueState:
    """Mimics pyspark's ValueState surface: exists/get/update/clear."""

    def __init__(self) -> None:
        self._value = None

    def exists(self) -> bool:
        return self._value is not None

    def get(self):
        return self._value

    def update(self, v) -> None:
        self._value = v

    def clear(self) -> None:
        self._value = None


class FakeHandle:
    def __init__(self) -> None:
        self.states: dict[str, FakeValueState] = {}

    def getValueState(self, name: str, schema) -> FakeValueState:
        return self.states.setdefault(name, FakeValueState())


def _batch(values) -> pd.DataFrame:
    return pd.DataFrame({"user_id": [7] * len(values), "value": values})


def test_accumulate_totals_pure_fold():
    n, v = accumulate_totals((0, 0.0), iter([_batch([1.5, 2.5]), _batch([4.0])]))
    assert (n, v) == (3, 8.0)
    # folding from a prior state is the same as one big fold
    n2, v2 = accumulate_totals((n, v), iter([_batch([10.0])]))
    assert (n2, v2) == (4, 18.0)


def test_user_totals_first_batch():
    proc = _make_user_totals()()
    handle = FakeHandle()
    proc.init(handle)
    out = list(proc.handleInputRows((7,), iter([_batch([1.0, 2.0])]), None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_events"], row["sum_value"]) == (7, 2, 3.0)
    assert handle.states["totals"].get() == (2, 3.0)


def test_user_totals_state_carries_across_micro_batches():
    proc = _make_user_totals()()
    handle = FakeHandle()
    proc.init(handle)
    list(proc.handleInputRows((7,), iter([_batch([1.0, 2.0])]), None))
    out = list(proc.handleInputRows((7,), iter([_batch([0.25]), _batch([0.75])]), None))
    row = out[0].iloc[0]
    # 2 + 2 rows, 3.0 + 1.0 value — the second emission must include
    # the first batch's totals via the ValueState, not restart at zero
    assert (row["n_events"], row["sum_value"]) == (4, 4.0)
    proc.close()


def test_user_totals_matches_batch_answer():
    """Replaying per-key micro-batches through the processor must
    converge to the plain pandas groupby answer — the same batch≡stream
    equivalence the oracle-checked streaming queries assert on Spark."""
    events = pd.DataFrame(
        {
            "user_id": [1, 2, 1, 1, 2, 3],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.5],
        }
    )
    expected = events.groupby("user_id")["value"].agg(["count", "sum"])

    # the state store scopes every ValueState PER KEY; the fake mirrors
    # that with one processor+handle per user
    cls = _make_user_totals()
    procs: dict[int, object] = {}
    final: dict[int, pd.Series] = {}
    # two micro-batches, split mid-stream, grouped per key like the
    # state operator would see them
    for lo, hi in ((0, 3), (3, 6)):
        chunk = events.iloc[lo:hi]
        for uid, grp in chunk.groupby("user_id"):
            if uid not in procs:
                procs[uid] = cls()
                procs[uid].init(FakeHandle())
            (out,) = procs[uid].handleInputRows((uid,), iter([grp]), None)
            final[uid] = out.iloc[0]
    for uid, row in final.items():
        assert row["n_events"] == expected.loc[uid, "count"]
        assert row["sum_value"] == round(float(expected.loc[uid, "sum"]), 2)


class FakeGroupState:
    """Mimics pyspark GroupState: exists/get are PROPERTIES (unlike
    ValueState's methods), update is a method."""

    def __init__(self) -> None:
        self._value = None

    @property
    def exists(self) -> bool:
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v) -> None:
        self._value = v


def test_both_stateful_branches_emit_identical_output():
    """stream_transform_with_state's docstring claims its two branches
    (transformWithStateInPandas UserTotals vs the applyInPandasWithState
    fallback) produce identical output by construction. Make that
    checkable (r5 verdict item 6): drive track_user_totals and
    UserTotals over the SAME static per-key micro-batches and assert
    byte-equal emissions, including the state carry-over batch."""
    from linux_logs_spark.streaming.queries import track_user_totals

    cls = _make_user_totals()
    proc = cls()
    proc.init(FakeHandle())
    gstate = FakeGroupState()

    batches = [[_batch([1.0, 2.0]), _batch([0.5])], [_batch([10.25])]]
    for pdfs in batches:
        (a,) = list(proc.handleInputRows((7,), iter(pdfs), None))
        (b,) = list(track_user_totals((7,), iter(pdfs), gstate))
        pd.testing.assert_frame_equal(a, b)
    # final states agree too
    assert gstate.get == proc._totals.get()
