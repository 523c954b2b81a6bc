"""Third-implementation checks for the nonparametric/robust operators:
the oracle gate proves Spark == DuckDB on the SAME formulas; these tests
prove the formulas themselves against independent brute-force Python on
a tiny constructed corpus (ties included on purpose)."""

from __future__ import annotations

import math

import pytest

from weather_bigdata_project_spark.registry import QUERIES


@pytest.fixture(scope="module")
def tiny_events_dir(spark, tmp_path_factory):
    """A hand-sized events fixture: known weekday/weekend split with
    value ties across and within groups. 2024-01-01 is a Monday;
    2024-01-06/07 the weekend."""
    rows = []
    eid = 0
    # weekday values (Mon-Fri): includes ties 10.00 and 12.50
    for day, vals in [
        ("2024-01-01", [10.00, 12.50, 13.00]),
        ("2024-01-02", [10.00, 15.25]),
        ("2024-01-03", [12.50, 9.75]),
        ("2024-01-04", [11.00]),
        ("2024-01-05", [14.00, 10.00]),
    ]:
        for v in vals:
            rows.append((eid, f"{day} 10:00:00", eid % 3, "click", v, "{}"))
            eid += 1
    # weekend values: overlaps the tie values
    for day, vals in [
        ("2024-01-06", [12.50, 16.00, 10.00]),
        ("2024-01-07", [18.25, 12.50]),
    ]:
        for v in vals:
            rows.append((eid, f"{day} 10:00:00", eid % 3, "view", v, "{}"))
            eid += 1
    df = spark.createDataFrame(
        [(e, t, u, ty, v, p) for e, t, u, ty, v, p in rows],
        "event_id LONG, ts_s STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id",
        "to_timestamp_ntz(ts_s) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = tmp_path_factory.mktemp("tiny_events")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    wknd_vals = [v for _, t, _, _, v, _ in rows if t[:10] in ("2024-01-06", "2024-01-07")]
    wkdy_vals = [v for _, t, _, _, v, _ in rows if t[:10] not in ("2024-01-06", "2024-01-07")]
    return str(d), sorted(wknd_vals), sorted(wkdy_vals)


def _avg_ranks(all_vals):
    """value -> average rank (1-based, ties averaged)."""
    s = sorted(all_vals)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_mannwhitney_matches_bruteforce(spark, tiny_events_dir):
    d, g1, g2 = tiny_events_dir  # g1 = weekend, g2 = weekday
    out = QUERIES["events_mannwhitney_u"](spark, d).collect()[0]
    n1, n2 = len(g1), len(g2)
    ranks = _avg_ranks(g1 + g2)
    r1 = sum(ranks[v] for v in g1)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie correction
    from collections import Counter

    cnt = Counter(g1 + g2)
    tie_t = sum(c**3 - c for c in cnt.values())
    n = n1 + n2
    var = n1 * n2 / 12.0 * ((n + 1) - tie_t / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["u1"] == pytest.approx(u1, abs=1e-9)
    assert out["z_u"] == pytest.approx(z, abs=1e-6)


def test_ks_matches_bruteforce(spark, tiny_events_dir):
    d, g1, g2 = tiny_events_dir
    out = QUERIES["events_ks_weekend"](spark, d).collect()[0]
    n1, n2 = len(g1), len(g2)
    xs = sorted(set(g1 + g2))
    dmax = max(
        abs(
            sum(v <= x for v in g1) / n1
            - sum(v <= x for v in g2) / n2
        )
        for x in xs
    )
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["ks_d"] == pytest.approx(dmax, abs=1e-6)
    lam = dmax * math.sqrt(n1 * n2 / (n1 + n2))
    assert out["ks_lambda"] == pytest.approx(lam, abs=1e-6)


def test_theilsen_matches_bruteforce(spark, tiny_events_dir):
    d, g1, g2 = tiny_events_dir
    out = QUERIES["events_theilsen_trend"](spark, d).collect()[0]
    # daily totals in cents, day-indexed 1..7 (dense dates here)
    import collections

    daily = collections.defaultdict(int)
    # rebuild from fixture structure: read back via spark for fidelity
    rows = (
        spark.read.parquet(f"{d}/events.parquet")
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "CAST(ROUND(value * 100.0e0) AS BIGINT) AS c",
        )
        .collect()
    )
    for r in rows:
        daily[r["day"]] += r["c"]
    ys = [daily[k] for k in sorted(daily)]
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    lower_median = slopes[(len(slopes) + 1) // 2 - 1]
    assert out["n_days"] == len(ys)
    assert out["n_pairs"] == len(slopes)
    assert out["theilsen_slope_dollars_per_day"] == pytest.approx(
        lower_median / 100.0, abs=1e-4
    )


def test_rake_matches_bruteforce(spark, tmp_path_factory):
    """RAKE on a constructed corpus vs an independent implementation
    (phrase split on the engine stopword list, deg/freq scores)."""
    from weather_bigdata_project_spark.operators.textops import STOPWORDS

    texts = [
        "deep learning is the new hot topic of machine learning",
        "machine learning and deep learning in production",
        "the hot topic is deep learning",
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    d = tmp_path_factory.mktemp("tiny_docs")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r["phrase"]: (r["n_occ"], r["rake_score"])
        for r in QUERIES["text_rake_keywords"](spark, str(d)).collect()
    }
    # independent RAKE
    stop = set(STOPWORDS)
    phrases = []
    for t in texts:
        run = []
        for tok in t.split(" "):
            if tok in stop:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(tuple(run))
    from collections import Counter, defaultdict

    freq, deg = Counter(), Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    score_u = {w: round(1e6 * deg[w] / freq[w]) for w in freq}
    want = defaultdict(lambda: [0, 0])
    for ph in phrases:
        key = " ".join(ph)
        want[key][0] += 1
        want[key][1] = sum(score_u[w] for w in ph) / 1e6
    for ph, (n, sc) in want.items():
        assert ph in got, f"missing phrase {ph!r}"
        assert got[ph][0] == n
        assert got[ph][1] == pytest.approx(sc, abs=1e-9)


def test_sprt_matches_bruteforce(spark, tiny_events_dir):
    """SPRT crossing point vs a pure-Python scan of the same ordered
    observations under the same snapped integer increments."""
    d, _, _ = tiny_events_dir
    out = QUERIES["events_ab_sprt"](spark, d).collect()[0]
    rows = (
        spark.read.parquet(f"{d}/events.parquet")
        .selectExpr("ts", "event_id", "event_type")
        .collect()
    )
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))
    C1, C0, A = 182322, -22473, 2944439
    llr, hit = 0, None
    for i, r in enumerate(rows, 1):
        llr += C1 if r["event_type"] == "purchase" else C0
        if hit is None and (llr >= A or llr <= -A):
            hit = (i, llr, "accept_h1" if llr >= A else "accept_h0")
    assert out["n_total"] == len(rows)
    assert out["llr_final"] == pytest.approx(llr / 1e6, abs=1e-6)
    if hit is None:
        assert out["decision"] == "continue"
        assert out["n_at_decision"] is None
    else:
        assert out["decision"] == hit[2]
        assert out["n_at_decision"] == hit[0]
        assert out["llr_at_decision"] == pytest.approx(
            hit[1] / 1e6, abs=1e-6
        )
