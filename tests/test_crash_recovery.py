"""Crash-injection test: a flow killed (SIGKILL-equivalent ``os._exit``)
between its hub append and satellite append must leave recoverable state —
``vault.recover()`` removes the torn rows, and re-running the flow
reproduces exactly the state of a never-crashed run.

Runs each phase in a subprocess against a SHARED derby-backed hive
metastore (the in-memory catalog would forget the tables between
processes), so the kill is a real process death, not a simulated
exception.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES_CSV = """base_name,rel_type,column_name,column_type,column_position,mapping
orders,stg,order_id,INTEGER,1,c
orders,stg,status,VARCHAR(32),2,c
orders,hub,order_id,INTEGER,1,bk
orders_details,hsat,orders,,0,hk
orders_details,hsat,status,VARCHAR(32),1,c
"""

TRANSITIONS_CSV = """source_table,source_field,target_table,target_field,group_name,position,raw,transformation,transfer_type
orders,order_id,hub_orders,order_id_bk,orders,1,false,,bk
orders,orders_hk,hsat_orders_details,orders,orders_details,0,false,,sat_full
orders,status,hsat_orders_details,status,orders_details,1,false,,f
"""

COMMON = """
import os, sys
sys.path.insert(0, "@@REPO@@")
base = "@@BASE@@"
os.chdir(base)  # derby metastore_db lives in cwd -> shared across phases
from mallarddv_spark import MallardSparkVault, get_spark

spark = get_spark(
    master="local[4]", shuffle_partitions=4, warehouse_dir=f"{base}/wh",
    extra_conf={"spark.sql.catalogImplementation": "hive"},
)
vault = MallardSparkVault(spark)
"""

PHASE1 = COMMON + """
vault.init_vault(f"{base}/tables.csv", f"{base}/transitions.csv")
assert vault.execute_flow("orders", "crash", f"{base}/orders1.csv",
                          load_date_overwrite="2025-01-01 00:00:00") == []
print("BASELINE", spark.table("dv.hub_orders").count(),
      spark.table("dv.hsat_orders_details").count(), flush=True)

# kill the driver AFTER the hub append of flow 2 commits, BEFORE satellites
from mallarddv_spark.operators import satellite
def boom(*a, **k):
    os._exit(137)
satellite.load_sats = boom
import mallarddv_spark.flow.executor as executor
executor.satellite.load_sats = boom
vault.execute_flow("orders", "crash", f"{base}/orders2.csv",
                   load_date_overwrite="2025-01-02 00:00:00")
print("SHOULD-NEVER-PRINT", flush=True)
"""

PHASE2 = COMMON + """
# torn state: flow 2's hub rows exist, no satellite rows, no ledger rows
hub_before = spark.table("dv.hub_orders").count()
runs = spark.table("metadata.runinfo").count()
print("TORN", hub_before, runs, flush=True)

from mallarddv_spark.flow.recovery import orphan_run_ids
orphans = orphan_run_ids(spark, "metadata", "dv")
print("ORPHANS", orphans, flush=True)

removed = vault.recover()
print("REMOVED", sorted(removed.items()), flush=True)

# rolled back to the post-flow-1 state
assert spark.table("dv.hub_orders").count() == 2, "rollback should restore 2 hub rows"
assert vault.recover() == {}, "second recover must be a no-op"

# re-run the interrupted flow: file never reached 'success', so it loads
assert vault.execute_flow("orders", "crash", f"{base}/orders2.csv",
                          load_date_overwrite="2025-01-02 00:00:00") == []
hub_n = spark.table("dv.hub_orders").count()
sat = sorted(
    (r.orders_hk, str(r.load_dts), r.del_flag, r.status)
    for r in spark.table("dv.hsat_orders_details").collect()
)
print("FINAL", hub_n, len(sat), flush=True)
# flow2: order 3 is new (hub 1,2,3); sat: 2 initial + changed o1 + tombstone o2
assert hub_n == 3
assert len(sat) == 5
tombs = [s for s in sat if s[2]]
assert len(tombs) == 1
print("RECOVERY-OK", flush=True)
"""


TABLES2_CSV = """base_name,rel_type,column_name,column_type,column_position,mapping
orders,stg,order_id,INTEGER,1,c
orders,stg,cust_id,INTEGER,2,c
orders,stg,status,VARCHAR(32),3,c
orders,hub,order_id,INTEGER,1,bk
custs,hub,cust_id,INTEGER,1,bk
"""

TRANSITIONS2_CSV = """source_table,source_field,target_table,target_field,group_name,position,raw,transformation,transfer_type
orders,order_id,hub_orders,order_id_bk,orders,1,false,,bk
orders,cust_id,hub_custs,cust_id_bk,custs,1,false,,bk
"""

PHASE1_MID = COMMON + """
vault.init_vault(f"{base}/tables.csv", f"{base}/transitions.csv")
assert vault.execute_flow("orders", "crash", f"{base}/orders1.csv",
                          load_date_overwrite="2025-01-01 00:00:00") == []
print("BASELINE", spark.table("dv.hub_orders").count(),
      spark.table("dv.hub_custs").count(), flush=True)

# kill the driver MID-HUB-STAGE: the first hub's append has committed,
# the second hub's has not — a torn append inside one load stage
from mallarddv_spark.operators import parallel
_real = parallel.run_per_table
def run_then_die(tasks, max_workers=4):
    first = sorted(tasks)[0]
    for fn in tasks[first]:
        fn()
    os._exit(137)
parallel.run_per_table = run_then_die
vault.execute_flow("orders", "crash", f"{base}/orders2.csv",
                   load_date_overwrite="2025-01-02 00:00:00")
print("SHOULD-NEVER-PRINT", flush=True)
"""

PHASE2_MID = COMMON + """
# torn: hub_custs (alphabetically first task chain) got flow 2's append,
# hub_orders did not, no ledger success row
custs_torn = spark.table("dv.hub_custs").count()
orders_torn = spark.table("dv.hub_orders").count()
print("TORN", custs_torn, orders_torn, flush=True)
assert custs_torn == 3 and orders_torn == 2, "expected a half-applied hub stage"

from mallarddv_spark.flow.recovery import orphan_run_ids
orphans = orphan_run_ids(spark, "metadata", "dv")
assert orphans, "torn run must be detected as orphan"

removed = vault.recover()
print("REMOVED", sorted(removed.items()), flush=True)
# the partial run's rows are deleted BY RUN_ID from the half-written hub
assert spark.table("dv.hub_custs").count() == 2
assert spark.table("dv.hub_orders").count() == 2
assert vault.recover() == {}, "second recover must be a no-op"

# re-run completes both hubs
assert vault.execute_flow("orders", "crash", f"{base}/orders2.csv",
                          load_date_overwrite="2025-01-02 00:00:00") == []
assert spark.table("dv.hub_orders").count() == 3
assert spark.table("dv.hub_custs").count() == 3
print("RECOVERY-OK", flush=True)
"""


def _run(script: str, base: str, expect_rc=0) -> subprocess.CompletedProcess:
    p = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=420,
        cwd=base,
    )
    return p


def test_killed_flow_recovers(tmp_path):
    base = str(tmp_path)
    (tmp_path / "tables.csv").write_text(TABLES_CSV)
    (tmp_path / "transitions.csv").write_text(TRANSITIONS_CSV)
    (tmp_path / "orders1.csv").write_text("order_id,status\n1,open\n2,open\n")
    # flow 2: order 1 changed, order 2 vanished (tombstone), order 3 new
    (tmp_path / "orders2.csv").write_text("order_id,status\n1,closed\n3,open\n")

    def fill(s):
        return s.replace("@@REPO@@", REPO).replace("@@BASE@@", base)

    p1 = _run(fill(PHASE1), base)
    assert p1.returncode == 137, f"phase1 should die with 137:\n{p1.stdout}\n{p1.stderr}"
    assert "BASELINE 2 2" in p1.stdout
    assert "SHOULD-NEVER-PRINT" not in p1.stdout

    p2 = _run(fill(PHASE2), base)
    assert p2.returncode == 0, f"phase2 failed:\n{p2.stdout}\n{p2.stderr[-3000:]}"
    assert "RECOVERY-OK" in p2.stdout
    # phase-2 observed the torn hub (3 rows) before rollback
    assert "TORN 3" in p2.stdout


def test_killed_mid_hub_stage_recovers(tmp_path):
    """Kill DURING the hub append stage (first hub committed, second not):
    recover() must delete the partial run's rows by run_id and a re-run
    must complete both hubs."""
    base = str(tmp_path)
    (tmp_path / "tables.csv").write_text(TABLES2_CSV)
    (tmp_path / "transitions.csv").write_text(TRANSITIONS2_CSV)
    (tmp_path / "orders1.csv").write_text(
        "order_id,cust_id,status\n1,10,open\n2,20,open\n"
    )
    # flow 2 adds one new order and one new customer to each hub
    (tmp_path / "orders2.csv").write_text(
        "order_id,cust_id,status\n1,10,open\n2,20,open\n3,30,open\n"
    )

    def fill(s):
        return s.replace("@@REPO@@", REPO).replace("@@BASE@@", base)

    p1 = _run(fill(PHASE1_MID), base)
    assert p1.returncode == 137, f"phase1 should die with 137:\n{p1.stdout}\n{p1.stderr}"
    assert "BASELINE 2 2" in p1.stdout
    assert "SHOULD-NEVER-PRINT" not in p1.stdout

    p2 = _run(fill(PHASE2_MID), base)
    assert p2.returncode == 0, f"phase2 failed:\n{p2.stdout}\n{p2.stderr[-3000:]}"
    assert "RECOVERY-OK" in p2.stdout
