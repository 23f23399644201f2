"""Semantic pins for the round-6b statistics queries: each is replayed in
plain Python from the raw parquet rows (the oracle sweep pins cross-engine
equality; these pin that the registered plan computes the intended
statistic — a wrong-but-consistent query would pass the oracle gate and
fail here)."""

from __future__ import annotations

import pytest as _pytest_mark_mod

#: registry-wide sweep / heavy e2e — excluded from the fast dev loop
pytestmark = _pytest_mark_mod.mark.slow

import math
from collections import Counter, defaultdict
from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal

_EPOCH = datetime(1970, 1, 1)

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.sources.tables import load_table

_Q12 = Decimal("1e-12")


def _events(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .filter("value IS NOT NULL")
        .select("event_type", "user_id", "event_id", "ts", "value")
        .collect()
    )
    out = []
    for r in rows:
        # exact integer epoch-micros (collected datetimes are naive UTC —
        # the session pins spark.sql.session.timeZone=UTC); float
        # .timestamp() would round 53-bit seconds and is host-tz-dependent
        td = r["ts"].replace(tzinfo=None) - _EPOCH
        us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        # Spark round() is HALF_UP; Python round() is half-even
        cents = int(
            Decimal(repr(r["value"] * 100)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        out.append((r["event_type"], r["user_id"], r["event_id"], us, cents))
    return out


def _lower_median(sorted_vals):
    return sorted_vals[(len(sorted_vals) + 1) // 2 - 1]


def test_theil_sen_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    want = {}
    by_type = defaultdict(list)
    for t, _u, eid, us, cents in ev:
        by_type[t].append((us, eid, cents))
    for t, rows in by_type.items():
        rows.sort()
        m = len(rows) // 2
        slopes = []
        for i in range(m):
            us1, _e1, c1 = rows[i]
            us2, _e2, c2 = rows[i + m]
            if us2 != us1:
                # pair index i+1 is the tie-break — keep it
                slopes.append(((c2 - c1) / (us2 - us1), i + 1))
        if not slopes:
            continue
        slopes.sort()
        med = _lower_median(slopes)[0]
        # replay Spark round() (HALF_UP on the shortest decimal repr)
        want[t] = (
            len(slopes),
            float(
                Decimal(repr(med * 36000000.0)).quantize(
                    Decimal("1e-6"), rounding=ROUND_HALF_UP
                )
            ),
        )
    got = {
        r["event_type"]: (r["n_pairs"], r["slope_per_hour"])
        for r in REGISTRY["c2_theil_sen"].build(spark, sf_dir).collect()
    }
    assert got == want


def test_mutual_information_matches_python_replay(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source")
        .collect()
    )
    n = float(len(rows))
    cells = Counter((r["lang"], r["source"]) for r in rows)
    cx = Counter(r["lang"] for r in rows)
    cy = Counter(r["source"] for r in rows)

    def q12(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(_Q12, rounding=ROUND_HALF_UP)

    mi = float(
        sum(
            (
                q12((cxy / n) * math.log(cxy * n / (cx[lx] * cy[sy])))
                for (lx, sy), cxy in cells.items()
            ),
            Decimal(0),
        )
    )
    hx = float(
        sum((q12(-(c / n) * math.log(c / n)) for c in cx.values()), Decimal(0))
    )
    hy = float(
        sum((q12(-(c / n) * math.log(c / n)) for c in cy.values()), Decimal(0))
    )
    row = REGISTRY["c2_mutual_information"].build(spark, sf_dir).collect()[0]
    assert row["n_docs"] == len(rows)
    assert math.isclose(row["mi_nats"], mi, rel_tol=0, abs_tol=1e-9)
    assert math.isclose(row["h_lang"], hx, abs_tol=1e-9)
    assert math.isclose(row["h_source"], hy, abs_tol=1e-9)
    # MI is bounded by each marginal entropy; NMI must land in [0, 1]
    assert 0.0 <= row["mi_nats"] <= min(hx, hy) + 1e-9
    assert row["nmi"] is None or 0.0 <= row["nmi"] <= 1.0


def test_seasonal_decompose_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    buckets = defaultdict(list)
    for t, _u, _e, us, cents in ev:
        buckets[(t, us // 3_600_000_000)].append(cents)
    series = defaultdict(list)
    for (t, hb), cs in buckets.items():
        series[t].append((hb, sum(cs) / (100 * len(cs))))
    span, half = 23, 11

    def q6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(
            Decimal("1e-6"), rounding=ROUND_HALF_UP
        )

    want = defaultdict(lambda: [0, Decimal(0)])
    for t, pts in series.items():
        pts.sort()
        for i in range(half, len(pts) - half):
            frame = pts[i - half : i + half + 1]
            if len(frame) != span:
                continue
            trend = float(sum((q6(bm) for _hb, bm in frame), Decimal(0))) / span
            hb, bm = pts[i]
            acc = want[(t, hb % 24)]
            acc[0] += 1
            acc[1] += q6(bm - trend)
    # final rounding must replay Spark's round() (HALF_UP over the shortest
    # decimal repr), not Python's binary half-even round()
    expect = {
        k: (n, float(q6(float(s) / n))) for k, (n, s) in want.items() if n
    }
    got = {
        (r["event_type"], r["hod"]): (r["n_buckets"], r["seasonal"])
        for r in REGISTRY["c16_seasonal_decompose"].build(spark, sf_dir).collect()
    }
    assert got == expect


def test_hampel_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_user = defaultdict(list)
    for _t, u, eid, us, cents in ev:
        by_user[u].append((us, eid, cents))
    want = set()
    for u, rows in by_user.items():
        rows.sort()
        cs = [c for _us, _e, c in rows]
        for i, (_us, eid, c) in enumerate(rows):
            lo, hi = max(0, i - 3), min(len(cs), i + 4)
            vs = sorted(cs[lo:hi])
            med = _lower_median(vs)
            mad = _lower_median(sorted(abs(x - med) for x in vs))
            if abs(c - med) * 10000 > 44478 * mad:
                want.add((u, eid, c, med, mad))
    got = {
        (r["user_id"], r["event_id"], r["cents"], r["med"], r["mad"])
        for r in REGISTRY["c16_hampel"].build(spark, sf_dir).collect()
    }
    assert got == want
    # the filter must be selective — flagging everything (mad bug) or
    # nothing (fence bug) on real data are both failures
    n_events = len(ev)
    assert 0 < len(got) < n_events / 4


def _trade_pairs(spark, sf_dir, min_qty=None):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    if min_qty is not None:
        li = li.filter(li["l_quantity"] >= min_qty)
    return {
        (r["o_custkey"], r["l_suppkey"])
        for r in orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    }


def test_kcore_matches_converged_python_peel(spark, sf_dir):
    """The registered semantics is the BOUNDED 8-round peel; this pins that
    8 rounds is CONVERGED on the test graph (the replay peels to a
    fixpoint) and that the surviving degrees are the true 3-core degrees."""
    pairs = _trade_pairs(spark, sf_dir, min_qty=45)
    adj = defaultdict(set)
    for c, s in pairs:
        adj[("c", c)].add(("s", s))
        adj[("s", s)].add(("c", c))
    alive = set(adj)
    while True:
        drop = {n for n in alive if sum(p in alive for p in adj[n]) < 3}
        if not drop:
            break
        alive -= drop
    want = {
        f"{n[0]}{n[1]}": sum(p in alive for p in adj[n]) for n in alive
    }
    got = {
        r["node"]: r["degree"]
        for r in REGISTRY["c17_kcore"].build(spark, sf_dir).collect()
    }
    assert got == want
    # the peel must actually remove something, or the query degenerates
    # into a plain degree count
    assert len(want) < len(adj)


def test_modularity_matches_python_replay(spark, sf_dir):
    pairs = _trade_pairs(spark, sf_dir)
    cn = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    sn = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    m = float(len(pairs))
    intra = Counter()
    degs = Counter()
    for c, s in pairs:
        degs[cn[c]] += 1
        degs[sn[s]] += 1
        if cn[c] == sn[s]:
            intra[cn[c]] += 1

    def q12(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(_Q12, rounding=ROUND_HALF_UP)
        )

    want = {
        nk: (
            intra.get(nk, 0),
            d,
            q12(intra.get(nk, 0) / m - (d / (2 * m)) * (d / (2 * m))),
        )
        for nk, d in degs.items()
    }
    got = {
        r["nationkey"]: (r["intra_edges"], r["deg_sum"], r["contribution"])
        for r in REGISTRY["c17_modularity"].build(spark, sf_dir).collect()
    }
    assert got == want
    # sanity: modularity contributions of a real partition sum inside [-1, 1]
    q_total = sum(v[2] for v in want.values())
    assert -1.0 <= q_total <= 1.0


def test_cogroup_asof_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    import bisect

    views = defaultdict(list)
    for t, u, _e, us, _c in ev:
        if t == "view":
            views[u].append(us)
    for v in views.values():
        v.sort()
    want = {}
    n_matched = 0
    for t, u, eid, us, _c in ev:
        if t != "purchase":
            continue
        vs = views.get(u, [])
        i = bisect.bisect_right(vs, us) - 1
        last = vs[i] if i >= 0 else None
        want[eid] = (u, us, last, None if last is None else us - last)
        n_matched += last is not None
    got = {
        r["event_id"]: (r["user_id"], r["us"], r["last_view_us"], r["gap_us"])
        for r in REGISTRY["c13_cogroup_asof"].build(spark, sf_dir).collect()
    }
    assert got == want
    # both branches of the merge must be exercised on real data
    assert 0 < n_matched < len(want)


def test_psi_drift_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cents = [(t, c) for t, _u, _e, _us, c in ev]
    mn = min(c for _t, c in cents)
    mx = max(c for _t, c in cents)
    n = float(len(cents))
    buckets = [(t, (c - mn) * 10 // (mx - mn + 1)) for t, c in cents]
    glob = Counter(b for _t, b in buckets)
    nt = Counter(t for t, _b in buckets)
    act = Counter(buckets)

    def q12(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(_Q12, rounding=ROUND_HALF_UP)

    want = {}
    for t, cnt in nt.items():
        total = Decimal(0)
        for b, cb in glob.items():
            a = act.get((t, b), 0) / cnt or 0.0001
            e = cb / n
            total += q12((a - e) * math.log(a / e))
        want[t] = (cnt, float(total))
    got = {
        r["event_type"]: (r["n_events"], r["psi"])
        for r in REGISTRY["c20_psi_drift"].build(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0]
        assert math.isclose(got[t][1], want[t][1], abs_tol=1e-9), t
    # PSI is non-negative by Gibbs' inequality (up to the eps substitution)
    assert all(v[1] > -1e-6 for v in got.values())


def test_theil_sen_by_user_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_key = defaultdict(list)
    for t, u, eid, us, cents in ev:
        by_key[(u, t)].append((us, eid, cents))
    want = {}
    for key, rows in by_key.items():
        rows.sort()
        m = len(rows) // 2
        slopes = []
        for i in range(m):
            us1, _e1, c1 = rows[i]
            us2, _e2, c2 = rows[i + m]
            if us2 != us1:
                slopes.append(((c2 - c1) / (us2 - us1), i + 1))
        if not slopes:
            continue
        slopes.sort()
        med = _lower_median(slopes)[0]
        want[key] = (
            len(slopes),
            float(
                Decimal(repr(med * 36000000.0)).quantize(
                    Decimal("1e-6"), rounding=ROUND_HALF_UP
                )
            ),
        )
    got = {
        (r["user_id"], r["event_type"]): (r["n_pairs"], r["slope_per_hour"])
        for r in REGISTRY["c2_theil_sen_by_user"].build(spark, sf_dir).collect()
    }
    assert got == want
    # the entity axis must actually fan out
    assert len(want) > 20


def test_quantile_normalize_matches_python_replay(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    docs = [(r["doc_id"], r["source"], r["n_chars"]) for r in rows]
    pooled = sorted(c for _d, _s, c in docs)
    n = len(pooled)
    by_src = defaultdict(list)
    for d, s, c in docs:
        by_src[s].append((c, d))
    want = {}
    for s, vs in by_src.items():
        vs.sort()
        ns = len(vs)
        for rnk, (c, d) in enumerate(vs, start=1):
            if ns > 1:
                gi = int(
                    Decimal(repr((rnk - 1) * 100.0 / (ns - 1))).quantize(
                        Decimal("1"), rounding=ROUND_HALF_UP
                    )
                )
            else:
                gi = 50
            want[d] = (s, c, pooled[gi * (n - 1) // 100])
    got = {
        r["doc_id"]: (r["source"], r["n_chars"], r["normalized"])
        for r in REGISTRY["c2_quantile_normalize"].build(spark, sf_dir).collect()
    }
    assert got == want
    # normalization must be monotone within each source
    for s, vs in by_src.items():
        vals = [want[d][2] for _c, d in sorted(vs)]
        assert vals == sorted(vals)


def test_seasonal_residual_outliers_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    buckets = defaultdict(list)
    for t, _u, _e, us, cents in ev:
        buckets[(t, us // 3_600_000_000)].append(cents)
    series = defaultdict(list)
    for (t, hb), cs in buckets.items():
        series[t].append((hb, sum(cs) / (100 * len(cs))))
    span, half = 23, 11

    def q(x, d):
        return Decimal(repr(x)).quantize(
            Decimal(f"1e-{d}"), rounding=ROUND_HALF_UP
        )

    detr = []  # (type, hb, hod, detr)
    for t, pts in series.items():
        pts.sort()
        for i in range(half, len(pts) - half):
            frame = pts[i - half : i + half + 1]
            trend = float(sum((q(bm, 6) for _hb, bm in frame), Decimal(0))) / span
            hb, bm = pts[i]
            detr.append((t, hb, hb % 24, float(q(bm - trend, 6))))
    si = defaultdict(lambda: [0, Decimal(0)])
    for t, _hb, hod, dv in detr:
        acc = si[(t, hod)]
        acc[0] += 1
        acc[1] += Decimal(repr(dv)).quantize(Decimal("1e-6"))
    seasonal = {k: float(s) / n for k, (n, s) in si.items()}
    res = [
        (t, hb, dv - seasonal[(t, hod)]) for t, hb, hod, dv in detr
    ]
    stats = defaultdict(lambda: [0, Decimal(0), Decimal(0)])
    for t, _hb, r in res:
        acc = stats[t]
        acc[0] += 1
        acc[1] += q(r, 6)
        acc[2] += q(r * r, 12)
    want = set()
    for t, hb, r in res:
        n, sr, srr = stats[t]
        if n <= 1:
            continue
        num = float(srr) - float(sr) * float(sr) / n
        if num <= 0:
            continue
        sd = math.sqrt(num / (n - 1))
        if abs(r) > 3 * sd:
            want.add((t, hb, float(q(r, 6))))
    got = {
        (r["event_type"], r["hb"], r["residual"])
        for r in REGISTRY["c16_seasonal_residual_outliers"]
        .build(spark, sf_dir)
        .collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus must produce at least one anomaly


def test_markov_stationary_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_user = defaultdict(list)
    for t, u, eid, us, _c in ev:
        by_user[u].append((us, eid, t))
    # NB: _events drops NULL values, but the registered query does not
    # filter; rebuild from the unfiltered table
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        td = r["ts"].replace(tzinfo=None) - _EPOCH
        us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        by_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    pairs = Counter()
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    tot = Counter()
    for (a, _b), n in pairs.items():
        tot[a] += n
    prob = {(a, b): n / tot[a] for (a, b), n in pairs.items()}
    states = sorted(tot)
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(12):
        nxt = defaultdict(int)
        for (a, b), p in prob.items():
            nxt[b] += int(
                Decimal(repr(pi[a] * p * 1.0e15)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
        pi = {s: v / 1.0e15 for s, v in nxt.items()}
    want = {
        s: float(
            Decimal(repr(v)).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP
            )
        )
        for s, v in pi.items()
    }
    got = {
        r["event_type"]: r["stationary_prob"]
        for r in REGISTRY["c5_markov_stationary"].build(spark, sf_dir).collect()
    }
    assert got == want
    # a stationary distribution sums to ~1 (fixed-point rounding aside)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_soft_dedup_weights_matches_python_replay(spark, sf_dir):
    import hashlib

    rows = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    sizes = Counter(
        hashlib.md5(r["text"].encode("utf-8")).hexdigest() for r in rows
    )
    want = {}
    for r in rows:
        c = sizes[hashlib.md5(r["text"].encode("utf-8")).hexdigest()]
        want[r["doc_id"]] = (
            c,
            float(
                Decimal(repr(1.0 / c)).quantize(
                    Decimal("1e-9"), rounding=ROUND_HALF_UP
                )
            ),
        )
    got = {
        r["doc_id"]: (r["cluster_size"], r["weight"])
        for r in REGISTRY["c14_soft_dedup_weights"].build(spark, sf_dir).collect()
    }
    assert got == want
    # the weighted corpus mass equals the deduplicated doc count
    uniq = len(sizes)
    assert abs(sum(w for _c, w in got.values()) - uniq) < 1e-6


def test_asof_nearest_matches_python_replay(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .filter("event_type IN ('purchase', 'view')")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    purchases, views = defaultdict(list), defaultdict(list)
    ts_map = {}
    for r in rows:
        td = r["ts"].replace(tzinfo=None) - _EPOCH
        us = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
        ts_map[r["event_id"]] = r["ts"]
        if r["event_type"] == "purchase":
            purchases[r["user_id"]].append((us, r["event_id"]))
        else:
            views[r["user_id"]].append((us, r["event_id"]))
    want = {}
    for u, ps in purchases.items():
        vs = views.get(u, [])
        for pus, pid in ps:
            best = None
            for vus, vid in vs:
                adt = abs(pus - vus)
                dirn = 0 if vus <= pus else 1
                # tie order: (|dt|, backward-first, max vid backward /
                # min vid forward)
                key = (adt, dirn, -vid if dirn == 0 else vid)
                if best is None or key < best[0]:
                    best = (key, vid)
            want[pid] = (u, best[1] if best else None)
    got = {
        r["event_id"]: (r["user_id"], r["view_event_id"])
        for r in REGISTRY["c15_asof_nearest"].build(spark, sf_dir).collect()
    }
    assert got == want
    # both directions must win somewhere on real data
    back = sum(
        1
        for pid, (u, vid) in want.items()
        if vid is not None
        and dict((eid, us) for us, eid in views[u])[vid]
        <= dict((eid, us) for us, eid in purchases[u])[pid]
    )
    assert 0 < back < len([v for v in want.values() if v[1] is not None])


def test_winsorized_mean_matches_python_replay(spark, sf_dir):
    ev = _events(spark, sf_dir)
    by_type = defaultdict(list)
    for t, _u, eid, _us, cents in ev:
        by_type[t].append((cents, eid))
    want = {}
    for t, vs in by_type.items():
        vs.sort()
        n = len(vs)
        lo = vs[math.ceil(0.05 * n) - 1][0]
        hi = vs[math.ceil(0.95 * n) - 1][0]
        s = sum(min(max(c, lo), hi) for c, _e in vs)
        want[t] = (
            n,
            float(
                Decimal(repr(s / (100 * n))).quantize(
                    Decimal("1e-6"), rounding=ROUND_HALF_UP
                )
            ),
        )
        # winsorizing must clamp something on real data, and the result
        # must sit inside the fences
        assert lo / 100 <= want[t][1] <= hi / 100
    got = {
        r["event_type"]: (r["n"], r["winsorized_mean"])
        for r in REGISTRY["c2_winsorized_mean"].build(spark, sf_dir).collect()
    }
    assert got == want
