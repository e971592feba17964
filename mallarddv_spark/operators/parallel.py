"""Intra-stage parallelism for vault loads.

Loads targeting *different* DV tables are independent (no shared state
beyond the already-built hash view); running them from concurrent driver
threads lets Spark's scheduler overlap their jobs — on a cluster this
overlaps shuffle/scan waves, locally it overlaps job setup latencies.
Groups feeding the SAME table stay strictly ordered (a staging table can
feed one hub under several group names and later groups must see earlier
groups' keys — reference demo does exactly this).
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor


def run_per_table(
    tasks: dict[str, list[Callable[[], None]]], max_workers: int = 4
) -> None:
    """Run ``tasks[table]`` lists concurrently across tables, sequentially
    within each table. Raises the first exception encountered."""
    if not tasks:
        return
    if len(tasks) == 1:
        for fn in next(iter(tasks.values())):
            fn()
        return

    def run_chain(chain: list[Callable[[], None]]) -> None:
        for fn in chain:
            fn()

    with ThreadPoolExecutor(max_workers=min(max_workers, len(tasks))) as pool:
        futures = [pool.submit(run_chain, chain) for chain in tasks.values()]
        for f in futures:
            f.result()  # re-raises
