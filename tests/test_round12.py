"""Round-12 additions: PSI drift, purged time-series CV, stratified
IPW effect, deterministic A/B assignment, matryoshka truncation recall.

Planted-frame semantics here; exact-hash parity vs DuckDB is covered by
test_oracle_parity.py for all five registered queries.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
from pyspark.sql import Row


def _ts(s: str):
    return datetime.fromisoformat(s)


class TestPsiDrift:
    def _run(self, spark, monkeypatch, rows):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        return {r["event_type"]: r.asDict() for r in qa.events_psi_drift(spark, "_").collect()}

    def test_identical_halves_zero_psi(self, spark, monkeypatch):
        # same value in both halves -> every bucket's p == q -> psi 0.0
        rows = [
            Row(event_id=1, event_type="t1", ts=_ts("2024-01-01T01:00:00"), value=5.0),
            Row(event_id=2, event_type="t1", ts=_ts("2024-01-01T09:00:00"), value=5.0),
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got["t1"]["psi"] == 0.0
        assert got["t1"]["n_ref"] == 1 and got["t1"]["n_cur"] == 1
        assert got["t1"]["drifted"] is False

    def test_shifted_distribution_flags_drift(self, spark, monkeypatch):
        # half 0: three events in bucket 0; half 1: three in bucket 9.
        # max cents = 10000 -> bucket = c*10 div 10001: 500->0, 9500->9,
        # 10000->9.
        rows = [
            Row(event_id=1, event_type="t2", ts=_ts("2024-01-01T01:00:00"), value=5.0),
            Row(event_id=2, event_type="t2", ts=_ts("2024-01-01T02:00:00"), value=5.0),
            Row(event_id=3, event_type="t2", ts=_ts("2024-01-01T03:00:00"), value=5.0),
            Row(event_id=4, event_type="t2", ts=_ts("2024-01-01T07:00:00"), value=95.0),
            Row(event_id=5, event_type="t2", ts=_ts("2024-01-01T08:00:00"), value=95.0),
            Row(event_id=6, event_type="t2", ts=_ts("2024-01-01T09:00:00"), value=100.0),
        ]
        got = self._run(spark, monkeypatch, rows)
        # replicate the smoothed fold: buckets 500->0, 9500->9, 10000->9
        ref = {0: 3}
        cur = {9: 3}
        psi = 0.0
        for b in range(10):
            p = (ref.get(b, 0) + 1) / (3 + 10)
            q = (cur.get(b, 0) + 1) / (3 + 10)
            psi += (p - q) * math.log(p / q)
        assert got["t2"]["psi"] == round(psi, 4)
        assert got["t2"]["drifted"] is True


class TestPurgedCvFolds:
    def test_fold_geometry_and_purge(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # 50 distinct days, one 1-cent order each -> counts == day counts
        rows = [
            Row(o_orderkey=i, o_custkey=1, o_orderdate=date(2024, 1, 1 + (i % 31)).replace(
                month=1 + (i // 31)
            ), o_totalprice=0.01, o_orderpriority="5-LOW")
            for i in range(50)
        ]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        got = {r["fold"]: r.asDict() for r in qa.orders_purged_cv_folds(spark, "_").collect()}
        assert set(got) == {1, 2, 3, 4}
        for k, r in got.items():
            # test fifth k+1: indexes (10k, 10(k+1)]
            assert r["test_days"] == 10 and r["test_orders"] == 10
            # purge: train stops 7 index-days before the test fifth
            assert r["train_days"] == 10 * k - 7
            # the purge gap is honored in actual dates too
            assert (r["test_start"] - r["train_end"]).days == 8
            # expanding window: fold k+1's train strictly contains fold k's
            if k > 1:
                assert r["train_days"] > got[k - 1]["train_days"]

    def test_no_leakage_train_before_test(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        rows = [
            Row(o_orderkey=i, o_custkey=1,
                o_orderdate=date(2024, 1 + i // 28, 1 + i % 28),
                o_totalprice=1.0, o_orderpriority="5-LOW")
            for i in range(56)
        ]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        for r in qa.orders_purged_cv_folds(spark, "_").collect():
            assert r["train_end"] < r["test_start"]


class TestIpwSpend:
    def test_planted_effect_and_weighting(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # segment S1: 2 treated (spend 300, 500 cents), 2 control (100, 300)
        #   -> effect 400 - 200 = 200
        # segment S2: 1 treated (1000), 3 control (200, 400, 600)
        #   -> effect 1000 - 400 = 600
        # overall ATE = (4/8)*200 + (4/8)*600 = 400
        cust = [Row(c_custkey=i, c_mktsegment="S1" if i <= 4 else "S2") for i in range(1, 9)]
        orders = []
        spends = {1: (1, 300), 2: (1, 500), 3: (0, 100), 4: (0, 300),
                  5: (1, 1000), 6: (0, 200), 7: (0, 400), 8: (0, 600)}
        ok = 0
        for ck, (tr, cents) in spends.items():
            ok += 1
            orders.append(Row(
                o_orderkey=ok, o_custkey=ck, o_orderdate=date(2024, 1, 1),
                o_totalprice=cents / 100.0,
                o_orderpriority="1-URGENT" if tr else "5-LOW",
            ))

        def fake_load(s, d, t):
            return spark.createDataFrame(cust if t == "customer" else orders)

        monkeypatch.setattr(qa, "load", fake_load)
        got = {r["stratum"]: r.asDict() for r in qa.customer_ipw_spend(spark, "_").collect()}
        assert got["S1"]["effect_cents"] == 200.0
        assert got["S1"]["p_hat"] == 0.5
        assert got["S2"]["effect_cents"] == 600.0
        assert got["OVERALL"]["effect_cents"] == 400.0
        assert got["OVERALL"]["n"] == 8 and got["OVERALL"]["n_treated"] == 3

    def test_degenerate_strata_excluded(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # S1 all treated (no control), S2 mixed -> only S2 + OVERALL remain
        cust = [Row(c_custkey=i, c_mktsegment="S1" if i <= 2 else "S2") for i in range(1, 5)]
        orders = [
            Row(o_orderkey=1, o_custkey=1, o_orderdate=date(2024, 1, 1),
                o_totalprice=1.0, o_orderpriority="1-URGENT"),
            Row(o_orderkey=2, o_custkey=2, o_orderdate=date(2024, 1, 1),
                o_totalprice=2.0, o_orderpriority="1-URGENT"),
            Row(o_orderkey=3, o_custkey=3, o_orderdate=date(2024, 1, 1),
                o_totalprice=3.0, o_orderpriority="1-URGENT"),
        ]

        def fake_load(s, d, t):
            return spark.createDataFrame(cust if t == "customer" else orders)

        monkeypatch.setattr(qa, "load", fake_load)
        got = {r["stratum"] for r in qa.customer_ipw_spend(spark, "_").collect()}
        assert got == {"S2", "OVERALL"}


class TestAbAssignment:
    def test_deterministic_partition_and_conservation(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import curation as qc

        cust = [Row(c_custkey=i, c_mktsegment="SEG" + str(i % 2)) for i in range(1, 41)]
        orders = [
            Row(o_orderkey=i, o_custkey=i, o_orderdate=date(2024, 1, 1),
                o_totalprice=float(i), o_orderpriority="5-LOW")
            for i in range(1, 41)
        ]

        def fake_load(s, d, t):
            return spark.createDataFrame(cust if t == "customer" else orders)

        monkeypatch.setattr(qc, "load", fake_load)
        a = [r.asDict() for r in qc.customer_ab_assignment(spark, "_").collect()]
        b = [r.asDict() for r in qc.customer_ab_assignment(spark, "_").collect()]
        assert a == b  # pure function of ids
        for r in a:
            n_seg = sum(1 for c in cust if c.c_mktsegment == r["segment"])
            assert r["n_a"] + r["n_b"] == n_seg  # arms partition the segment
            total = sum(int(o.o_totalprice * 100) for o, c in zip(orders, cust)
                        if c.c_mktsegment == r["segment"])
            assert r["spend_a_cents"] + r["spend_b_cents"] == total

    def test_salt_changes_assignment_not_sizes(self, spark):
        # different salts must produce a different (but still
        # deterministic) split: the md5 bucket depends on the salt
        from pyspark.sql import functions as F

        from medical_examination_data_etl_system_spark.operators.curation import hash_bucket

        ids = spark.range(1, 201)
        a1 = ids.select(hash_bucket(F.concat(F.lit("ab1#"), F.col("id").cast("string")), 2).alias("a")).collect()
        a2 = ids.select(hash_bucket(F.concat(F.lit("ab2#"), F.col("id").cast("string")), 2).alias("a")).collect()
        assert [r["a"] for r in a1] != [r["a"] for r in a2]


class TestConformalForecast:
    def _orders(self, cents_by_day):
        return [
            Row(o_orderkey=i + 1, o_custkey=1, o_orderdate=date(2024, 1, 1 + i),
                o_totalprice=c / 100.0, o_orderpriority="5-LOW")
            for i, c in enumerate(cents_by_day)
        ]

    def test_constant_seasonal_residuals_full_coverage(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # cents = 100*i -> every lag-7 residual is exactly 700
        rows = self._orders([100 * (i + 1) for i in range(20)])
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        (r,) = qa.orders_conformal_forecast(spark, "_").collect()
        # D=20: residual rows i=8..20 (13); cal i<=16 (9 rows), test 17..20 (4)
        assert r["n_cal"] == 9 and r["n_test"] == 4
        assert r["q_cents"] == 700  # 9th of 9 identical residuals
        assert r["coverage"] == 1.0 and r["n_covered"] == 4

    def test_holdout_spike_breaks_coverage(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        cents = [100 * (i + 1) for i in range(20)]
        cents[18] += 5000  # day 19 (test region): residual 5700 > q=700
        rows = self._orders(cents)
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        (r,) = qa.orders_conformal_forecast(spark, "_").collect()
        assert r["q_cents"] == 700
        assert r["n_covered"] == 3 and r["coverage"] == 0.75


class TestCupedReadout:
    def test_planted_theta_and_adjustment(self, spark, monkeypatch):
        import hashlib

        from medical_examination_data_etl_system_spark.queries import curation as qc

        # 8 customers, pre-spend x and post-spend y correlated (y = 2x + noise)
        xy = {1: (100, 250), 2: (200, 410), 3: (300, 650), 4: (400, 790),
              5: (500, 1050), 6: (600, 1180), 7: (700, 1450), 8: (800, 1570)}
        cust = [Row(c_custkey=k, c_mktsegment="S") for k in xy]
        orders = []
        ok = 0
        for ck, (x, y) in xy.items():
            for ed, cents in ((date(2024, 1, 2), x), (date(2024, 1, 30), y)):
                ok += 1
                orders.append(Row(o_orderkey=ok, o_custkey=ck, o_orderdate=ed,
                                  o_totalprice=cents / 100.0, o_orderpriority="5-LOW"))

        def fake_load(s, d, t):
            return spark.createDataFrame(cust if t == "customer" else orders)

        monkeypatch.setattr(qc, "load", fake_load)
        got = {r["arm"]: r.asDict() for r in qc.customer_cuped_readout(spark, "_").collect()}

        def arm_of(ck):
            return int(hashlib.md5(f"ab1#{ck}".encode()).hexdigest()[:8], 16) % 2

        n = len(xy)
        sx = sum(x for x, _ in xy.values()); sy = sum(y for _, y in xy.values())
        sxy = sum(x * y for x, y in xy.values()); sxx = sum(x * x for x, _ in xy.values())
        theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        xbar = sx / n

        def r_half_up(v, nd):  # Spark/DuckDB round() is HALF_UP, python's is banker's
            s = 10 ** nd
            return math.floor(v * s + 0.5) / s

        for a in (0, 1):
            ks = [k for k in xy if arm_of(k) == a]
            assert got[a]["n"] == len(ks)
            my = sum(xy[k][1] for k in ks) / len(ks)
            mx = sum(xy[k][0] for k in ks) / len(ks)
            assert got[a]["mean_post_cents"] == r_half_up(my, 2)
            assert got[a]["cuped_adjusted_cents"] == r_half_up(my - theta * (mx - xbar), 2)
            assert got[a]["theta"] == r_half_up(theta, 6)
        # strong correlation planted -> CUPED removes most variance
        assert got[0]["var_reduction"] > 0.95

    def test_zero_variance_pre_period_degrades_gracefully(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import curation as qc

        # every customer has identical pre-spend -> var(X)=0 -> NULL theta
        cust = [Row(c_custkey=k, c_mktsegment="S") for k in (1, 2, 3, 4)]
        orders = []
        ok = 0
        for ck in (1, 2, 3, 4):
            for ed, cents in ((date(2024, 1, 2), 100), (date(2024, 1, 30), 100 * ck)):
                ok += 1
                orders.append(Row(o_orderkey=ok, o_custkey=ck, o_orderdate=ed,
                                  o_totalprice=cents / 100.0, o_orderpriority="5-LOW"))

        def fake_load(s, d, t):
            return spark.createDataFrame(cust if t == "customer" else orders)

        monkeypatch.setattr(qc, "load", fake_load)
        for r in qc.customer_cuped_readout(spark, "_").collect():
            assert r["theta"] is None and r["cuped_adjusted_cents"] is None
            assert r["mean_post_cents"] is not None


class TestItemCfRecommend:
    def test_planted_cosines_and_support_floor(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # parts 1,2 co-occur in 2 of their baskets; deg(1)=3, deg(2)=2
        #   -> cosine = 2/sqrt(6)
        # parts 1,3 co-occur once only -> below min support, excluded
        baskets = {10: [1, 2], 20: [1, 2], 30: [1, 3], 40: [3, 4], 50: [3, 4]}
        rows = [Row(l_orderkey=o, l_partkey=p, l_quantity=1.0,
                    l_extendedprice=1.0, l_discount=0.0)
                for o, ps in baskets.items() for p in ps]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        got = {(r["part_a"], r["part_b"]): r.asDict()
               for r in qa.lineitem_itemcf_recommend(spark, "_").collect()}
        assert set(got) == {(1, 2), (3, 4)}
        assert got[(1, 2)]["cooc"] == 2
        assert got[(1, 2)]["cosine"] == round(2 / math.sqrt(3 * 2), 4)
        # (3,4): cooc 2, deg(3)=3, deg(4)=2 -> same cosine; ranking is
        # by the exact integer key then (i, j): (1,2) before (3,4)
        assert list(got)[0] == (1, 2)

    def test_duplicate_lineitems_count_once(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # the same part twice in one order must not inflate cooc/deg
        rows = [Row(l_orderkey=o, l_partkey=p, l_quantity=1.0,
                    l_extendedprice=1.0, l_discount=0.0)
                for o, ps in {1: [7, 7, 8], 2: [7, 8, 8]}.items() for p in ps]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        (r,) = qa.lineitem_itemcf_recommend(spark, "_").collect()
        assert (r["part_a"], r["part_b"], r["cooc"]) == (7, 8, 2)
        assert r["deg_a"] == 2 and r["deg_b"] == 2
        assert r["cosine"] == 1.0


class TestMannWhitney:
    def _orders(self, spark, urgent_vals, other_vals):
        rows = []
        ok = 0
        for vals, pr in ((urgent_vals, "1-URGENT"), (other_vals, "5-LOW")):
            for v in vals:
                ok += 1
                rows.append(Row(o_orderkey=ok, o_custkey=1,
                                o_orderdate=date(2024, 1, 1),
                                o_totalprice=v / 100.0, o_orderpriority=pr))
        return spark.createDataFrame(rows)

    def test_textbook_tied_example(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # urgent {5,7}, other {1,3,5}: midranks 1,2,3.5,3.5,5
        # R1 = 3.5+5 = 8.5 -> U1 = 8.5 - 3 = 5.5; mu = 3
        # tie term: one tie of size 2 -> T = 6
        # sig2 = (2*3/12) * ((5+1) - 6/(5*4)) = 0.5 * 5.7 = 2.85
        df = self._orders(spark, [5, 7], [1, 3, 5])
        monkeypatch.setattr(qa, "load", lambda s, d, t: df)
        (r,) = qa.orders_mann_whitney(spark, "_").collect()
        assert (r["n_urgent"], r["n_other"]) == (2, 3)
        assert r["u_stat"] == 5.5 and r["u_null_mean"] == 3.0
        assert r["z"] == round(2.5 / math.sqrt(2.85), 4)
        assert r["significant"] is False

    def test_all_tied_null_z(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        df = self._orders(spark, [5, 5], [5, 5, 5])
        monkeypatch.setattr(qa, "load", lambda s, d, t: df)
        (r,) = qa.orders_mann_whitney(spark, "_").collect()
        assert r["z"] is None and r["significant"] is None
        assert r["u_stat"] == r["u_null_mean"] == 3.0

    def test_clean_separation_significant(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # urgent strictly above other, no ties, big enough for |z|>1.96
        df = self._orders(spark, list(range(101, 111)), list(range(1, 11)))
        monkeypatch.setattr(qa, "load", lambda s, d, t: df)
        (r,) = qa.orders_mann_whitney(spark, "_").collect()
        assert r["u_stat"] == 100.0  # every urgent beats every other
        assert r["significant"] is True


class TestOffpolicyEval:
    def test_uniform_logger_identities(self, spark, monkeypatch):
        import hashlib

        from medical_examination_data_etl_system_spark.queries import analytics as qa

        rows = [Row(event_id=i, user_id=i % 7, ts=_ts("2024-01-01T01:00:00"),
                    event_type="view", value=float(i % 13 + 1), props="{}")
                for i in range(1, 201)]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        got = {r["policy"]: r.asDict() for r in qa.events_offpolicy_eval(spark, "_").collect()}

        def arm(eid):
            return int(hashlib.md5(f"ope#{eid}".encode()).hexdigest()[:8], 16) % 4

        for policy, pi_of in (("personalized_mod4", lambda u: u % 4),
                              ("always_arm0", lambda u: 0)):
            matched = [(i, (i % 13 + 1) * 100) for i in range(1, 201)
                       if arm(i) == pi_of(i % 7)]
            n, nm = 200, len(matched)
            s = sum(c for _, c in matched)
            r = got[policy]
            assert (r["n_logged"], r["n_matched"]) == (n, nm)
            assert r["ips_value_cents"] == round(4.0 * s / n, 2)
            assert r["snips_value_cents"] == round(s / nm, 2)
            # uniform logger -> ESS degenerates to the match count
            assert r["effective_sample_size"] == nm

    def test_no_match_policy_null_snips(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import analytics as qa

        # single event whose logged arm can't be 0 AND user_id%4 both...
        # construct: user_id chosen so personalized pi != arm and arm != 0
        import hashlib

        eid = next(i for i in range(1, 50)
                   if int(hashlib.md5(f"ope#{i}".encode()).hexdigest()[:8], 16) % 4
                   not in (0,))
        arm = int(hashlib.md5(f"ope#{eid}".encode()).hexdigest()[:8], 16) % 4
        uid = (arm + 1) % 4  # personalized pi = uid%4 != arm
        rows = [Row(event_id=eid, user_id=uid, ts=_ts("2024-01-01T01:00:00"),
                    event_type="view", value=5.0, props="{}")]
        monkeypatch.setattr(qa, "load", lambda s, d, t: spark.createDataFrame(rows))
        got = {r["policy"]: r.asDict() for r in qa.events_offpolicy_eval(spark, "_").collect()}
        for p in got.values():
            assert p["n_matched"] == 0
            assert p["ips_value_cents"] == 0.0
            assert p["snips_value_cents"] is None


class TestMatryoshkaRecall:
    def test_numpy_cross_check(self, spark, monkeypatch):
        from medical_examination_data_etl_system_spark.queries import datapipe as qd

        rng = np.random.RandomState(7)
        n, d = 12, 64
        vecs = np.round(rng.uniform(-1, 1, size=(n, d)).astype(np.float32), 3)
        rows = [Row(vec_id=i, embedding=[float(x) for x in vecs[i]], label=0)
                for i in range(n)]
        monkeypatch.setattr(qd, "load", lambda s, dd, t: spark.createDataFrame(rows))
        got = {(r["query_id"], r["pdim"]): r.asDict()
               for r in qd.emb_matryoshka_recall(spark, "_").collect()}

        q = np.round(np.float64(vecs) * 1_000_000).astype(np.int64)
        for qi in range(5):
            others = [j for j in range(n) if j != qi]
            full = sorted(others, key=lambda j: (int(((q[qi] - q[j]) ** 2).sum()), j))[:5]
            for p in (16, 32, 64):
                pref = sorted(
                    others,
                    key=lambda j: (int(((q[qi][:p] - q[j][:p]) ** 2).sum()), j),
                )[:5]
                want = len(set(pref) & set(full))
                assert got[(qi, p)]["n_overlap"] == want
                assert got[(qi, p)]["recall_at_5"] == round(want / 5, 4)
        # the 64-prefix rows are the sanity anchor
        assert all(got[(qi, 64)]["recall_at_5"] == 1.0 for qi in range(5))
