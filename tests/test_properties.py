"""Property-based tests (hypothesis) — differential oracles for the
hand-written translation/join logic, a layer the reference's test
suite lacks entirely (SURVEY.md §5).

Spark-free on purpose: glob translation runs through Python `re`
(same dialect class as Java for these constructs) against `fnmatch`;
the as-of join's pure-python reference model is checked against
pandas `merge_asof`, and the Spark implementation is pinned to the
same model in tests/test_temporal.py's fixed cases.
"""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from filesystemagent_spark.operators.filters import glob_to_regex

# filenames and patterns over a compact alphabet rich in tricky chars
_NAME_ALPHA = "ab.?*[]!-/\\ "
names = st.text(alphabet=_NAME_ALPHA, min_size=0, max_size=12)
patterns = st.text(alphabet=_NAME_ALPHA, min_size=0, max_size=10)


@settings(max_examples=500, deadline=None)
@given(name=names, pattern=patterns)
def test_glob_to_regex_matches_fnmatch(name: str, pattern: str):
    """glob_to_regex must agree with fnmatch.fnmatchcase on every
    (name, pattern) pair — including degenerate classes, unclosed
    brackets, and backslashes."""
    rx = glob_to_regex(pattern)
    got = re.fullmatch(rx[1:-1], name) is not None  # strip ^$, fullmatch anchors
    want = fnmatch.fnmatchcase(name, pattern)
    assert got == want, f"pattern={pattern!r} name={name!r} rx={rx!r}"


def _asof_model(left, right, tolerance=None):
    """Reference model: for each (key, lts), the right row with the
    greatest rts <= lts."""
    out = []
    for key, lts in left:
        best = None
        for rkey, rts, rval in right:
            if rkey == key and rts <= lts and (best is None or rts > best[0]):
                best = (rts, rval)
        if best is not None and tolerance is not None and lts - best[0] > tolerance:
            best = None
        out.append((key, lts, None if best is None else best[1]))
    return out


@settings(max_examples=300, deadline=None)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=8
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=8
    ),
    tolerance=st.one_of(st.none(), st.integers(0, 20)),
)
def test_asof_model_matches_pandas(left, right, tolerance):
    """The as-of model underlying operators/temporal.py agrees with
    pandas merge_asof (backward, inclusive) wherever pandas defines
    it — pandas requires unique right (key, ts), so duplicates are
    collapsed keeping the last, matching window order."""
    import pandas as pd

    # collapse right duplicates: last wins (window-order semantics)
    rmap = {}
    for i, (k, t) in enumerate(right):
        rmap[(k, t)] = f"r{i}"
    runique = [(k, t, v) for (k, t), v in rmap.items()]

    want = _asof_model(left, runique, tolerance)

    lpd = pd.DataFrame(sorted(left, key=lambda x: x[1]), columns=["k", "ts"])
    rpd = pd.DataFrame(
        sorted(runique, key=lambda x: x[1]), columns=["k", "ts", "rval"]
    )
    if lpd.empty or rpd.empty:
        got = {(k, t): None for k, t in left}
    else:
        merged = pd.merge_asof(
            lpd,
            rpd,
            on="ts",
            by="k",
            direction="backward",
            tolerance=tolerance,
        )
        got = {}
        for _, row in merged.iterrows():
            v = row["rval"]
            got[(row["k"], row["ts"])] = None if pd.isna(v) else v
    for k, t, v in want:
        assert got.get((k, t)) == v, f"key={k} ts={t}: model={v} pandas={got.get((k, t))}"


@settings(max_examples=300, deadline=None)
@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=50,
    )
)
def test_ewma_fold_model(xs):
    """The EWMA left-fold used by events_type_ewma (init = first
    element, acc*0.7 + x*0.3) must equal the textbook recurrence —
    and be exactly reproducible, since every step is a fixed IEEE
    expression."""
    acc = xs[0]
    for x in xs[1:]:
        acc = acc * 0.7 + x * 0.3
    # recompute — bit-identical (no ambient state in the fold)
    acc2 = xs[0]
    for x in xs[1:]:
        acc2 = acc2 * 0.7 + x * 0.3
    assert acc == acc2
    # smoothing keeps the value inside the data envelope
    assert min(xs) - 1e-9 <= acc <= max(xs) + 1e-9


@settings(max_examples=300, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 30)),  # (user, day)
        min_size=1,
        max_size=120,
    )
)
def test_rolling_distinct_window_votes_model(rows):
    """events_rolling_distinct_users' explode-to-window trick: a
    (user, day) pair voting into days [day, day+6] must reproduce the
    brute-force 'distinct users with activity in [d-6, d]' for every
    observed day d."""
    pairs = set(rows)
    days = [d for _, d in pairs]
    lo, hi = min(days), max(days)
    votes: dict[int, set] = {}
    for u, d in pairs:
        for off in range(7):
            if lo <= d + off <= hi:
                votes.setdefault(d + off, set()).add(u)
    for d in range(lo, hi + 1):
        brute = {u for (u, dd) in pairs if d - 6 <= dd <= d}
        assert votes.get(d, set()) == brute, f"day {d}"


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(1, 50), st.integers(100, 10_000_000)),
        min_size=2,
        max_size=100,
    )
)
def test_corr_integer_partials_model(data):
    """lineitem_qty_price_corr's exact-partial formula must agree with
    the direct covariance/stddev definition (up to float tolerance)
    whenever the variance is nonzero."""
    import math

    n = len(data)
    sx = sum(x for x, _ in data)
    sy = sum(y for _, y in data)
    sxy = sum(x * y for x, y in data)
    sxx = sum(x * x for x, _ in data)
    syy = sum(y * y for _, y in data)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if dx == 0 or dy == 0:
        return  # constant column: correlation undefined
    got = (n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy))
    mx, my = sx / n, sy / n
    cov = sum((x - mx) * (y - my) for x, y in data) / n
    vx = sum((x - mx) ** 2 for x, _ in data) / n
    vy = sum((y - my) ** 2 for _, y in data) / n
    want = cov / math.sqrt(vx * vy)
    assert abs(got - want) < 1e-9


# -- DNF stats-pruning soundness (round 7) ---------------------------

_int_val = st.integers(-5, 15)
_str_val = st.text(alphabet="abc", min_size=0, max_size=2)


def _pred(col, scalar):
    # list values are legal only with "in" (the real grammar's rule)
    return st.one_of(
        st.tuples(
            st.just(col),
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            scalar,
        ),
        st.tuples(
            st.just(col),
            st.just("in"),
            st.lists(scalar, min_size=0, max_size=4),
        ),
    )


_pred_int = _pred("k", _int_val)
_pred_str = _pred("s", _str_val)
_conj = st.lists(st.one_of(_pred_int, _pred_str), min_size=1, max_size=3)
_dnf_strategy = st.one_of(
    _conj,  # flat conjunction grammar
    st.lists(_conj, min_size=1, max_size=3),  # OR of conjunctions
)
_rows = st.lists(
    st.tuples(st.integers(-5, 15), st.text(alphabet="abc", min_size=0, max_size=2)),
    min_size=1,
    max_size=8,
)


def _eval_pred(row, pred) -> bool:
    (k, s) = row
    col, op, val = pred
    x = k if col == "k" else s
    if op == "in":
        vals = list(val) if isinstance(val, (list, tuple)) else [val]
        return x in vals
    return {
        "=": x == val, "!=": x != val, "<": x < val, "<=": x <= val,
        ">": x > val, ">=": x >= val,
    }[op]


@settings(max_examples=500, deadline=None)
@given(rows=_rows, dnf=_dnf_strategy)
def test_dnf_stats_pruning_never_drops_a_matching_file(rows, dnf):
    """SOUNDNESS of the file-skipping test over the full predicate
    grammar: whenever `_dnf_may_match` prunes a file (returns False),
    no row in that file may satisfy the predicate under a direct
    row-level evaluation. (The reverse direction — pruning
    aggressiveness — is a performance property, not correctness.)"""
    from filesystemagent_spark.sources.txtable import _dnf, _dnf_may_match

    stats = {
        "k": [min(k for k, _ in rows), max(k for k, _ in rows)],
        "s": [min(s for _, s in rows), max(s for _, s in rows)],
    }
    norm = _dnf(dnf)

    def row_matches(row):
        return any(all(_eval_pred(row, p) for p in conj) for conj in norm)

    if not _dnf_may_match(stats, dnf):
        bad = [r for r in rows if row_matches(r)]
        assert not bad, f"pruned file holds matching rows {bad}; dnf={dnf}"


# -- round-8 codec slices: randomized round-trips ---------------------

_mp3_gains = st.lists(st.integers(0, 255), min_size=1, max_size=10)
_mp3_scfsi = st.lists(st.integers(0, 1), min_size=4, max_size=4)
# every scalefac_compress keeps bands within their slen fields via %
_mp3_compress = st.integers(0, 15)


@settings(max_examples=150, deadline=None)
@given(gains=_mp3_gains, scfsi=_mp3_scfsi, compress=_mp3_compress,
       seed=st.integers(0, 2**31), scale=st.integers(0, 1))
def test_mp3_envelope_roundtrip_property(gains, scfsi, compress, seed, scale):
    """encode_mp3_silence -> parse_mp3_envelope is the identity on the
    envelope for EVERY (gains, scfsi, scalefac_compress,
    scalefac_scale) combination — including slen1=0/slen2=0 compress
    codes where whole band ranges carry zero bits (and must read back
    as zeros), and scfsi granule-1 reuse against randomized granule-0
    values."""
    import random

    from filesystemagent_spark.functions import mp3 as M3

    rng = random.Random(seed)
    n = len(gains) + (len(gains) % 2)  # encoder pads to granule pairs
    s1 = M3._SLEN1[compress]
    s2 = M3._SLEN2[compress]
    sfs = [
        [rng.randrange(1 << (s1 if b < 11 else s2)) if (s1 if b < 11 else s2) else 0
         for b in range(21)]
        for _ in range(n)
    ]
    b = M3.encode_mp3_silence(
        gains, scalefacs=sfs, scalefac_compress=compress,
        scalefac_scale=scale, scfsi=scfsi,
    )
    env = M3.parse_mp3_envelope(b)
    got = env["granules"]
    want_gains = gains + ([gains[-1]] if len(gains) % 2 else [])
    assert [g["global_gain"] for g in got] == want_gains
    assert all(g["scalefac_scale"] == scale for g in got)
    for i, g in enumerate(got):
        if i % 2 == 1:  # granule 1: scfsi-flagged groups reuse granule 0
            want = [
                sfs[i - 1][band]
                if scfsi[
                    next(
                        gi
                        for gi, (a, e) in enumerate(M3._SCFSI_BANDS)
                        if a <= band < e
                    )
                ]
                else sfs[i][band]
                for band in range(21)
            ]
        else:
            want = sfs[i]
        assert g["scalefacs"] == want, (i, compress, scfsi)


@settings(max_examples=100, deadline=None)
@given(
    n_frames=st.integers(1, 6),
    fps=st.sampled_from([1.0, 2.0, 12.5, 25.0, 30.0]),
    sizes=st.lists(st.integers(4, 200), min_size=1, max_size=6),
    seed=st.integers(0, 2**31),
)
def test_mkv_container_roundtrip_property(n_frames, fps, sizes, seed):
    """encode_mkv_mjpeg -> decode_mkv_mjpeg returns the exact frame
    payloads and the encoded fps for arbitrary frame counts, sizes,
    and rates — the EBML writer and parser must agree on every vint
    width the sizes exercise."""
    import random

    from filesystemagent_spark.functions import mkv as MK

    rng = random.Random(seed)
    frames = [
        b"\xff\xd8" + bytes(rng.randrange(256) for _ in range(
            sizes[i % len(sizes)]
        )) + b"\xff\xd9"
        for i in range(n_frames)
    ]
    b = MK.encode_mkv_mjpeg(frames, fps=fps, width=8, height=8)
    got_fps, back = MK.decode_mkv_mjpeg(b)
    assert back == frames
    assert abs(got_fps - fps) / fps < 1e-6


# -- stats-pruning `in` test: bisect path vs the linear definition ----
#
# Round 10: _prep_dnf pre-sorts `in` value lists so _file_may_match
# proves a file's [min, max] empty by bisect instead of scanning the
# list per file (measured O(keys·files) driver cost, exp_probe_cap.py).
# The bisect must be EXACTLY the linear predicate — a false skip here
# is silent data loss at read time.

_in_vals = st.lists(st.integers(min_value=-50, max_value=50), max_size=30)
_bounds = st.tuples(
    st.integers(min_value=-60, max_value=60),
    st.integers(min_value=-60, max_value=60),
).map(lambda t: (min(t), max(t)))


@settings(max_examples=500, deadline=None)
@given(vals=_in_vals, bounds=_bounds)
def test_sorted_in_stats_test_equals_linear(vals, bounds):
    from filesystemagent_spark.sources.txtable import (
        _file_may_match,
        _prep_dnf,
    )

    mn, mx = bounds
    per = {"c": [mn, mx]}
    linear = any(mn <= x <= mx for x in vals)
    (prepped,) = _prep_dnf([("c", "in", vals)])
    got = all(_file_may_match(per, p) for p in prepped)
    assert got == linear


_in_floats = st.lists(
    st.one_of(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        st.just(float("nan")),
    ),
    max_size=20,
)


@settings(max_examples=500, deadline=None)
@given(vals=_in_floats, bounds=_bounds)
def test_sorted_in_stats_test_equals_linear_floats_with_nan(vals, bounds):
    """Round-10 review finding: NaN poisons sorted() SILENTLY (no
    TypeError, comparison-false ordering), so a NaN-bearing list must
    stay on the linear path — a corrupted bisect order would falsely
    prune files holding matching keys (silent row loss)."""
    import math

    from filesystemagent_spark.sources.txtable import (
        _file_may_match,
        _prep_dnf,
    )

    mn, mx = bounds
    per = {"c": [float(mn), float(mx)]}
    linear = any(
        not math.isnan(x) and mn <= x <= mx for x in vals
    )
    (prepped,) = _prep_dnf([("c", "in", vals)])
    got = all(_file_may_match(per, p) for p in prepped)
    assert got == linear
