"""One-hundred-thirteenth oracle-query batch — chance-corrected
inter-rater agreement coefficients. The two "raters" are deterministic
halves of the event stream: for each epoch day, rater A = the modal
event_type among ODD event_ids, rater B = the modal among EVEN ones
(ties broken by count desc, then event_type asc — identical rank rule
both sides); days missing a parity are excluded. Everything reduces to
exact integers (n pairs, agreements, per-category pooled marginals
q_k = nA_k + nB_k), and each coefficient clears its denominators to a
single ratio of exact ints:

- scott_pi_daily_types:  pi    = (4n*agree - SUM q^2) / (4n^2 - SUM q^2)
- gwet_ac1_daily_types:  AC1   = (4n(K-1)*agree - S) / (4n^2(K-1) - S),
  S = SUM q*(2n - q), K = 5 (the full event_type universe — categories
  never chosen as modal still belong to the rating scale)
- kripp_alpha_daily_types: alpha = 1 - 2(2n-1)*dis / (4n^2 - SUM q^2)
  (Krippendorff, nominal metric, 2 raters, no missing ratings)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Sum

from scrapy_ray.pipelines.queries import _pq
from scrapy_ray.pipelines.queries8 import _round6
from scrapy_ray.pipelines.queries47 import _strip

_K_TYPES = 5


def _modal_pairs(sf_dir: str) -> tuple[int, int, list[int]]:
    """(n_pairs, agree, pooled per-category marginals q_k) of the
    per-day odd/even modal-type pairing (docstring above)."""
    ds = _pq(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def cpart(t: pa.Table) -> pa.Table:
        d = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 86_400_000_000)
        p = (t["event_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64) % 2)
        df = pd.DataFrame({"d": d.astype(np.int64), "p": p,
                           "event_type": t["event_type"].to_pylist(),
                           "n": np.int64(1)})
        g = df.groupby(["d", "p", "event_type"], sort=False) \
              .sum().reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _strip(g)

    cells = (ds.map_batches(cpart, batch_format="pyarrow")
               .groupby(["d", "p", "event_type"])
               .aggregate(Sum("n", alias_name="n"))
               .to_pandas())
    # modal per (d, p): count desc, event_type asc — stable mergesort
    cells = cells.sort_values(["d", "p", "n", "event_type"],
                              ascending=[True, True, False, True],
                              kind="mergesort")
    modal = cells.groupby(["d", "p"], sort=False).head(1)
    a = modal[modal["p"] == 1][["d", "event_type"]].rename(
        columns={"event_type": "ta"})
    b = modal[modal["p"] == 0][["d", "event_type"]].rename(
        columns={"event_type": "tb"})
    pairs = a.merge(b, on="d", how="inner")
    n = len(pairs)
    agree = int((pairs["ta"] == pairs["tb"]).sum())
    q = (pairs["ta"].value_counts()
         .add(pairs["tb"].value_counts(), fill_value=0))
    return n, agree, [int(v) for v in q]


_SQL_PAIR_CTES = """
c AS (
  SELECT epoch_us(ts) // 86400000000 AS d, event_id % 2 AS p,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3),
m AS (
  SELECT d, p, event_type,
         row_number() OVER (PARTITION BY d, p
                            ORDER BY n DESC, event_type) AS r
  FROM c),
pairs AS (
  SELECT a.d, a.event_type AS ta, b.event_type AS tb
  FROM m a JOIN m b ON a.d = b.d AND b.p = 0
  WHERE a.p = 1 AND a.r = 1 AND b.r = 1),
q AS (
  SELECT k, count(*)::BIGINT AS q FROM (
    SELECT ta AS k FROM pairs UNION ALL SELECT tb FROM pairs)
  GROUP BY 1),
base AS (
  SELECT (SELECT count(*)::BIGINT FROM pairs) AS n,
         (SELECT sum((ta = tb)::INT)::BIGINT FROM pairs) AS agree,
         (SELECT sum(q * q)::BIGINT FROM q) AS sq2,
         (SELECT sum(q * (2 * (SELECT count(*)::BIGINT FROM pairs) - q)
                     )::BIGINT FROM q) AS s)
"""


def q_scott_pi_daily_types(sf_dir: str):
    """Scott's pi on the daily modal pairing (docstring above)."""
    n, agree, q = _modal_pairs(sf_dir)
    sq2 = sum(x * x for x in q)
    pi = float(4 * n * agree - sq2) / float(4 * n * n - sq2)
    out = pd.DataFrame({"n_pairs": [n], "agree": [agree], "sum_q2": [sq2],
                        "pi6": [_round6(np.array([pi]))[0]]})
    for col in ("n_pairs", "agree", "sum_q2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_SCOTT_PI = f"""
WITH {_SQL_PAIR_CTES}
SELECT n AS n_pairs, agree, sq2 AS sum_q2,
       round(CAST(4 * n * agree - sq2 AS DOUBLE)
             / CAST(4 * n * n - sq2 AS DOUBLE), 6) AS pi6
FROM base
"""


def q_gwet_ac1_daily_types(sf_dir: str):
    """Gwet's AC1 on the daily modal pairing (docstring above)."""
    n, agree, q = _modal_pairs(sf_dir)
    s = sum(x * (2 * n - x) for x in q)
    km1 = _K_TYPES - 1
    ac1 = (float(4 * n * km1 * agree - s)
           / float(4 * n * n * km1 - s))
    out = pd.DataFrame({"n_pairs": [n], "agree": [agree], "s": [s],
                        "ac16": [_round6(np.array([ac1]))[0]]})
    for col in ("n_pairs", "agree", "s"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_GWET_AC1 = f"""
WITH {_SQL_PAIR_CTES}
SELECT n AS n_pairs, agree, s,
       round(CAST(4 * n * {_K_TYPES - 1} * agree - s AS DOUBLE)
             / CAST(4 * n * n * {_K_TYPES - 1} - s AS DOUBLE), 6) AS ac16
FROM base
"""


def q_kripp_alpha_daily_types(sf_dir: str):
    """Krippendorff's alpha (nominal, 2 raters) on the daily modal
    pairing (docstring above)."""
    n, agree, q = _modal_pairs(sf_dir)
    sq2 = sum(x * x for x in q)
    dis = n - agree
    alpha = 1.0 - (float(2 * (2 * n - 1) * dis)
                   / float(4 * n * n - sq2))
    out = pd.DataFrame({"n_pairs": [n], "disagree": [dis],
                        "sum_q2": [sq2],
                        "alpha6": [_round6(np.array([alpha]))[0]]})
    for col in ("n_pairs", "disagree", "sum_q2"):
        out[col] = out[col].astype(np.int64)
    return out


SQL_KRIPP_ALPHA = f"""
WITH {_SQL_PAIR_CTES}
SELECT n AS n_pairs, n - agree AS disagree, sq2 AS sum_q2,
       round(1.0 - CAST(2 * (2 * n - 1) * (n - agree) AS DOUBLE)
             / CAST(4 * n * n - sq2 AS DOUBLE), 6) AS alpha6
FROM base
"""


QUERIES113: dict[str, tuple] = {
    "scott_pi_daily_types": (q_scott_pi_daily_types, SQL_SCOTT_PI),
    "gwet_ac1_daily_types": (q_gwet_ac1_daily_types, SQL_GWET_AC1),
    "kripp_alpha_daily_types": (q_kripp_alpha_daily_types,
                                SQL_KRIPP_ALPHA),
}
