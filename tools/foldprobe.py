"""Guard for the oracle's dot-product accumulation order.

Bit-exact parity of every dot-product query (q27/q28/q29/q30/q34/q42/q46)
rests on DuckDB's list_dot_product accumulating as a sequential
left-to-right double fold — an implementation detail of the pinned build
(1.0.0), not a documented contract. This probe distinguishes sequential
from pairwise/SIMD accumulation: with a = [1e16, 1, 1, 1] the sequential
fold loses every +1 (ulp at 1e16 is 2), giving exactly 1e16, while a
pairwise tree computes (1e16+1)+(1+1) = 1e16+2.

If the probe fails after a DuckDB upgrade, switch DotSeqSql (graft/
functions/VectorFunctions.scala) to the DotSeqSqlFold body — the explicit
list_reduce sequential fold that IS the semantic definition.
"""

PINNED_DUCKDB = "1.0.0"


def check_fold_order(con):
    import duckdb
    if duckdb.__version__ != PINNED_DUCKDB:
        print(f"WARN: duckdb {duckdb.__version__} != pinned {PINNED_DUCKDB}; "
              "fold-order probe is now the only guard")
    seq, fused = con.execute(
        "SELECT list_reduce([x * 1.0 for x in [1e16, 1.0, 1.0, 1.0]],"
        "                   (a, b) -> a + b),"
        "       list_dot_product(CAST([1e16, 1, 1, 1] AS DOUBLE[]),"
        "                        CAST([1, 1, 1, 1] AS DOUBLE[]))").fetchone()
    assert seq == 1e16, f"probe arithmetic broken: sequential fold = {seq!r}"
    if fused != seq:
        raise SystemExit(
            f"ABORT: DuckDB list_dot_product no longer accumulates as a "
            f"sequential fold (probe: {fused!r} != {seq!r}). Every "
            f"dot-product oracle is untrustworthy until DotSeqSql is "
            f"switched to the DotSeqSqlFold form (see VectorFunctions.scala) "
            f"and Verify is re-run.")
