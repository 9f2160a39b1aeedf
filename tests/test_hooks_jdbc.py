"""X2 hook DSL + JDBC option-assembly tests."""

from linz_bde_uploader_spark.control.hooks import (
    condition_holds, parse_hook_block, run_hook_block,
)
from linz_bde_uploader_spark.control.ledger import Ledger
from linz_bde_uploader_spark.sources.jdbc import JdbcTarget


def test_parse_plain_statements():
    stmts = parse_hook_block("SELECT 1;\n  SELECT bde_CheckStatus({id});  ;")
    assert [s.sql for s in stmts] == ["SELECT 1", "SELECT bde_CheckStatus({id})"]
    assert all(s.tables is None for s in stmts)


def test_parse_conditional_dsl():
    block = ("if any crs_parcel_bndry crs_statute loaded ? SELECT refresh();"
             "if all level0 crs_parcel_bndry affected ? SELECT rebuild();")
    s1, s2 = parse_hook_block(block)
    assert s1.quantifier == "any" and s1.tables == ["crs_parcel_bndry", "crs_statute"]
    assert s1.test == "loaded" and not s1.level0_only
    assert s2.quantifier == "all" and s2.level0_only and s2.test == "affected"


def _ledger_with_stats(tmp_path):
    led = Ledger(str(tmp_path / "ctl"))
    job = led.create_job()

    class S:
        ninsert, nupdate, nnullupdate, ndelete = 3, 0, 0, 0

    class Z:
        ninsert = nupdate = nnullupdate = ndelete = 0

    led.record_dataset_loaded(job.id, "crs_parcel_bndry", "d1", "0", S())
    led.record_dataset_loaded(job.id, "crs_statute", "d1", "0", Z())
    return led, job


def test_condition_evaluation(tmp_path):
    led, job = _ledger_with_stats(tmp_path)
    any_loaded = parse_hook_block(
        "if any crs_parcel_bndry missing_table loaded ? SELECT 1")[0]
    all_loaded = parse_hook_block(
        "if all crs_parcel_bndry missing_table loaded ? SELECT 1")[0]
    affected = parse_hook_block(
        "if all crs_statute affected ? SELECT 1")[0]
    assert condition_holds(any_loaded, led, job.id)
    assert not condition_holds(all_loaded, led, job.id)
    assert not condition_holds(affected, led, job.id)  # zero-change load
    l0 = parse_hook_block("if any level0 crs_parcel_bndry loaded ? SELECT 1")[0]
    assert condition_holds(l0, led, job.id, level0_ran=True)
    assert not condition_holds(l0, led, job.id, level0_ran=False)


def test_run_hook_block_substitutes_and_filters(tmp_path):
    led, job = _ledger_with_stats(tmp_path)
    ran = []
    block = ("SELECT start({id});"
             "if all crs_statute affected ? SELECT never();"
             "if any crs_parcel_bndry loaded ? SELECT yes({id})")
    executed = run_hook_block(block, ran.append, led, job.id)
    assert executed == [f"SELECT start({job.id})", f"SELECT yes({job.id})"]
    assert ran == executed


def test_jdbc_options():
    t = JdbcTarget(url="jdbc:postgresql://db:5432/bde", user="u", password="p")
    opts = t.options("crs_parcel_bndry")
    assert opts["dbtable"] == "bde.crs_parcel_bndry"
    # pgjdbc property is case-sensitive: reWriteBatchedInserts
    assert opts["reWriteBatchedInserts"] == "true"
    assert opts["driver"] == "org.postgresql.Driver"
