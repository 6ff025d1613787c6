"""Hypothesis property: the entity-tier online merge
(online/entity_serving.merge_mutation_state) over tiled snapshot IRs +
signed CDC mutations equals a direct row-by-row replay of the reference
rule (SawtoothMutationAggregator semantics: hop-aligned window tail on row
ts, strict mutation_ts < T head, before-images subtract, live-count <= 0
finalizes to null). Pure Python — no Spark — so hypothesis can hammer the
tail/sign/null logic cheaply."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from zipline_chronon_spark.api import (Aggregation, EventSource, GroupBy,
                                       Operation, Query, TimeUnit, Window)
from zipline_chronon_spark.online.entity_serving import merge_mutation_state
from zipline_chronon_spark.online.fetcher import _parts

BASE = 1_700_000_000_000
HOP = 300_000           # 5m tail hop of the 1h window
W_MS = 3_600_000
BATCH_END = BASE + 2 * 86_400_000  # hop-aligned (BASE % HOP == 0)


def _gb():
    return GroupBy(
        name="pem",
        sources=(EventSource(table="unused", query=Query(time_column="ts")),),
        key_columns=("k",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(Window(1, TimeUnit.HOURS), None)),
            Aggregation("v", Operation.COUNT, windows=(Window(1, TimeUnit.HOURS), None)),
            Aggregation("v", Operation.AVERAGE, windows=(None,)),
        ),
    )


snap_rows = st.lists(
    st.tuples(st.integers(0, 2 * 86_400_000 - 1),          # ts offset below batch_end
              st.one_of(st.none(), st.integers(-50, 50))),  # value (None = null input)
    max_size=25)
mut_rows = st.lists(
    st.tuples(st.integers(0, 2 * 86_400_000 + W_MS),       # row ts offset
              st.integers(0, W_MS - 1),                    # mut_ts offset past batch end
              st.integers(-50, 50),
              st.sampled_from([1, -1])),
    max_size=25)


@settings(max_examples=200, deadline=None)
@given(snap=snap_rows, muts=mut_rows, t_off=st.integers(0, W_MS - 1))
def test_merge_equals_direct_replay(snap, muts, t_off):
    gb = _gb()
    parts = _parts(gb)
    T = BATCH_END + t_off

    # build the batch state exactly as the upload split defines it:
    # rows below the 1h-window tail floor at batch_end collapse; the rest
    # tile at the finest tail hop. IRs carry per-part __sum/__count.
    floor = ((BATCH_END - W_MS) // HOP) * HOP

    def ir_of(rows):
        ir = {}
        vals = [v for _, v in rows if v is not None]
        for p in parts:
            nm = p.output_name
            ir[f"{nm}__sum"] = sum(vals)
            ir[f"{nm}__count"] = len(vals)
        return ir

    srows = [(BASE + off, v) for off, v in snap]
    old = [(ts, v) for ts, v in srows if ts < floor]
    recent = [(ts, v) for ts, v in srows if ts >= floor]
    tiles = {}
    for ts, v in recent:
        tiles.setdefault((ts // HOP) * HOP, []).append((ts, v))
    tiles_list = [(hs, ir_of(rs)) for hs, rs in sorted(tiles.items())]
    collapsed = ir_of(old) if old else None

    mlist = [{"ts": BASE + r_off if r_off < 2 * 86_400_000 else BATCH_END + (r_off - 2 * 86_400_000),
              "mts": BATCH_END + m_off, "sign": sg, "v": val}
             for r_off, m_off, val, sg in muts]

    got = merge_mutation_state(parts, collapsed, tiles_list, mlist, T)

    # direct replay of the rule
    for p in parts:
        nm = p.output_name
        if p.window is None:
            s_in = [v for ts, v in srows if v is not None]
            m_in = [(m["sign"], m["v"]) for m in mlist
                    if m["mts"] < T and m["ts"] < T and m["v"] is not None]
        else:
            tail = ((T - p.window.millis) // HOP) * HOP
            s_in = [v for ts, v in srows if v is not None and ts >= tail]
            m_in = [(m["sign"], m["v"]) for m in mlist
                    if m["mts"] < T and tail <= m["ts"] < T and m["v"] is not None]
        cnt = len(s_in) + sum(sg for sg, _ in m_in)
        tot = sum(s_in) + sum(sg * v for sg, v in m_in)
        if cnt <= 0:
            exp = None
        elif p.operation == Operation.SUM:
            exp = tot
        elif p.operation == Operation.COUNT:
            exp = cnt
        else:
            exp = tot / cnt
        g = got[nm]
        if exp is None:
            assert g is None, (nm, g, "expected null at live-count<=0")
        else:
            assert g is not None and abs(g - exp) < 1e-9, (nm, g, exp)
