"""Property-based tests (hypothesis) for the trickiest kernels.

- The pure-Catalyst stitch fold must agree with a direct Python
  transcription of the reference algorithm (osm_connector.py:648-670)
  on arbitrary way sequences — contiguous, reversed, branching, broken.
- The opening_hours window expansion must PARTITION each day's open
  span: windows don't overlap, cover the span exactly, and carry
  consistent day flags / service ids.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from osm2gtfs_spark.functions.opening_hours import (
    DAY_ABBR,
    service_id_for,
    tags_to_windows,
)
from osm2gtfs_spark.plans.gtfs import _stitch_fold


def stitch_reference(id_lists: list[list[int]]) -> list[int]:
    """Direct transcription of osm_connector.py:648-670."""
    if not id_lists:
        return []
    sorter = list(id_lists[0])
    for ids in id_lists[1:]:
        if sorter[-1] == ids[0]:
            del sorter[-1]
            sorter.extend(ids)
        elif sorter[-1] == ids[-1]:
            del sorter[-1]
            sorter.extend(reversed(ids))
        elif sorter[0] == ids[0]:
            del sorter[0]
            sorter.reverse()
            sorter.extend(ids)
        elif sorter[0] == ids[-1]:
            del sorter[0]
            sorter.reverse()
            sorter.extend(reversed(ids))
        else:
            break
    return sorter


way = st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=5)
ways_case = st.lists(way, min_size=1, max_size=6)


def test_stitch_fold_matches_reference_oracle(spark):
    """Batch 300 hypothesis-generated way sequences through ONE Spark
    job and compare every chain against the Python oracle. Small node-id
    alphabet (0..9) maximizes junction collisions — the interesting
    cases (reversals, head-side flips, breaks) occur constantly."""
    cases: list[list[list[int]]] = []

    @settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
    @given(ways_case)
    def gen(c):
        cases.append(c)

    gen()
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        "case_id int, ways array<array<bigint>>",
    )
    got = {
        r["case_id"]: list(r["chain"])
        for r in df.select("case_id", _stitch_fold(F.col("ways")).alias("chain")).collect()
    }
    for i, c in enumerate(cases):
        want = stitch_reference(c)
        assert got[i] == want, f"case {i}: ways={c} got={got[i]} want={want}"


day_spec = st.one_of(
    st.sampled_from(["Mo-Fr", "Sa-Su", "Mo-Su", "Mo-Sa", "Sa", "Su", "Mo,We,Fr", "Tu-Th", "Su-Tu"]),
    st.just(""),
)
hour = st.integers(min_value=0, max_value=23)
minute = st.sampled_from([0, 15, 30, 45])


@st.composite
def opening_rule(draw):
    d = draw(day_spec)
    h1, h2 = sorted(draw(st.tuples(hour, hour)))
    if h1 == h2:
        h2 = h1 + 1
    m1, m2 = draw(minute), draw(minute)
    span = f"{h1:02d}:{m1:02d}-{h2:02d}:{m2:02d}"
    return (d + " " + span).strip()


@settings(max_examples=200, deadline=None)
@given(
    rule=opening_rule(),
    interval=st.sampled_from(["00:05", "00:30", "01:00", "15"]),
    cond_start=st.integers(min_value=5, max_value=20),
)
def test_windows_partition_the_open_span(rule, interval, cond_start):
    cond = f"00:07 @ (Mo-Fr {cond_start:02d}:00-{cond_start + 2:02d}:00)"
    wins = tags_to_windows(rule, interval, cond)
    # windows per day: non-overlapping, sorted, exactly covering the span
    for day in range(7):
        todays = sorted(
            (w["start_secs"], w["end_secs"], w["headway_secs"])
            for w in wins
            if w["day_flags"][day]
        )
        for (s1, e1, _), (s2, e2, _) in zip(todays, todays[1:]):
            assert e1 <= s2, f"overlap on day {day}: {todays}"
        for s, e, hw in todays:
            assert s < e and hw > 0
        # coverage: union of today's windows is contiguous per open span
        if todays:
            merged = [list(todays[0][:2])]
            for s, e, _ in todays[1:]:
                if s == merged[-1][1]:
                    merged[-1][1] = e
                else:
                    merged.append([s, e])
            # a single opening rule yields one contiguous covered span
            assert len(merged) == 1, f"gap on day {day}: {todays}"
    # service ids consistent with flags
    for w in wins:
        days = frozenset(i for i in range(7) if w["day_flags"][i])
        assert w["service_id"] == service_id_for(days)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=6)))
def test_service_id_roundtrip(days):
    sid = service_id_for(frozenset(days))
    if not days:
        assert sid == "Mo-Su"
        return
    if "-" in sid and "," not in sid:
        a, b = sid.split("-")
        lo, hi = DAY_ABBR.index(a), DAY_ABBR.index(b)
        assert frozenset(range(lo, hi + 1)) == frozenset(days)
    elif "-" not in sid:
        assert sid == ",".join(DAY_ABBR[i] for i in sorted(days))
