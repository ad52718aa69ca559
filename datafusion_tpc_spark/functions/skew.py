"""Skew-handling utilities — the salting patterns a 100 TB pipeline
needs when AQE's skew-join splitting isn't available or isn't enough
(e.g. skewed aggregation keys, which AQE does not salt).

Two compositions, both pure DataFrame transforms:

- salted_aggregate: two-phase aggregation through an explicit salt —
  phase 1 aggregates on (key, salt) spreading one hot key over N
  reducers, phase 2 merges the partials. Works for any algebraic
  aggregate (sum/count/min/max — and avg via sum+count merge).
- salted_join: replicate the small side N ways, salt the skewed fact
  side uniformly — a hot key's rows spread across N tasks instead of
  one straggler.

The declared queries rely on AQE for skew (session default); these
utilities are the manual escape hatch and are equivalence-tested
against their unsalted forms in tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    agg_exprs: output_name → one of 'sum:<col>', 'count', 'min:<col>',
    'max:<col>', 'avg:<col>'. The salt is a uniform hash of the full
    row's monotonically-increasing id substitute (spark_partition_id +
    a per-row counter is unnecessary — a hash of all columns does),
    so one hot key spreads over n_salts reducers.
    """
    # pmod, not abs(...)%n: non-ANSI abs(Int.MinValue) stays negative,
    # so a ~2^-32 hash value would yield a salt outside [0, n_salts).
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("__salt")
    salted = df.withColumn("__salt", salt)

    phase1, phase2 = [], []
    for name, spec in agg_exprs.items():
        op, _, col = spec.partition(":")
        if op == "sum":
            phase1.append(F.sum(col).alias(f"__s_{name}"))
            phase2.append(F.sum(f"__s_{name}").alias(name))
        elif op == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__c_{name}"))
            phase2.append(F.sum(f"__c_{name}").alias(name))
        elif op == "min":
            phase1.append(F.min(col).alias(f"__m_{name}"))
            phase2.append(F.min(f"__m_{name}").alias(name))
        elif op == "max":
            phase1.append(F.max(col).alias(f"__x_{name}"))
            phase2.append(F.max(f"__x_{name}").alias(name))
        elif op == "avg":
            phase1.append(F.sum(col).alias(f"__as_{name}"))
            phase1.append(F.count(col).alias(f"__ac_{name}"))
            phase2.append(
                (F.sum(f"__as_{name}") / F.sum(f"__ac_{name}")).alias(name)
            )
        else:
            raise ValueError(f"unsupported agg spec {spec!r}")

    partial = salted.groupBy(*key_cols, "__salt").agg(*phase1)
    return partial.groupBy(*key_cols).agg(*phase2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a uniform salt in
    [0, n_salts); the dim side is replicated n_salts× with every salt
    value; join on (key, salt). A key with 10⁹ fact rows becomes
    n_salts tasks of 10⁹/n_salts instead of one straggler.

    Replication cost: |dim| × n_salts — use only when dim is small
    relative to the skew being fixed (else AQE skew-join)."""
    # pmod keeps the salt in [0, n_salts) even when hash() returns
    # Int.MinValue (abs(...)%n would go negative and silently drop the
    # row from an inner join — no replicated dim salt matches it).
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")
