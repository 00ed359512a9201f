"""DAG pruning and execution (⇄ reference src/shelf/steps.py).

Build-level optimization is all *build avoidance* (SURVEY §4.1): regex
subgraph selection, Merkle dirty-pruning, and topological execution.
Improvement over the reference's strictly serial loop (steps.py:71-74):
steps whose dependencies are satisfied run concurrently on a thread pool
— Spark jobs from separate threads share the session and the scheduler
interleaves their stages (FAIR-friendly).
"""

from __future__ import annotations

import re
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from graphlib import TopologicalSorter

from pyspark.sql import SparkSession

from .snapshots import Snapshot
from .tables import build_table, is_completed
from .types import Dag, StepURI


def in_topological_order(dag: Dag) -> list[StepURI]:
    ts = TopologicalSorter({s: list(deps) for s, deps in dag.items()})
    return list(ts.static_order())


def prune_with_regex(dag: Dag, pattern: str, descendents: bool = True) -> Dag:
    """Keep steps matching the regex plus all ancestors (and, by default,
    descendants with *their* ancestors) — reference steps.py:10-37."""
    rx = re.compile(pattern)
    seeds = {s for s in dag if rx.search(str(s))}
    if descendents:
        changed = True
        while changed:
            changed = False
            for s, deps in dag.items():
                if s not in seeds and any(d in seeds for d in deps):
                    seeds.add(s)
                    changed = True
    keep = set(seeds)
    frontier = list(seeds)
    while frontier:
        step = frontier.pop()
        for dep in dag.get(step, []):
            if dep not in keep:
                keep.add(dep)
                frontier.append(dep)
    return {s: [d for d in deps] for s, deps in dag.items() if s in keep}


def _step_completed(step: StepURI, deps: list[StepURI]) -> bool:
    if step.scheme == "snapshot":
        try:
            return Snapshot.load(step).is_up_to_date()
        except Exception:
            return False
    return is_completed(step, deps)


def prune_completed(dag: Dag) -> Dag:
    """Walk topo order; a step is dirty if any dep is dirty or its own
    freshness check fails. Keep only dirty steps (reference steps.py:40-54)."""
    dirty: set[StepURI] = set()
    for step in in_topological_order(dag):
        deps = dag.get(step, [])
        if any(d in dirty for d in deps) or not _step_completed(step, deps):
            dirty.add(step)
    return {s: deps for s, deps in dag.items() if s in dirty}


def execute_step(spark: SparkSession, step: StepURI, deps: list[StepURI]) -> None:
    if step.scheme == "snapshot":
        Snapshot.load(step).fetch()
    else:
        build_table(spark, step, deps)


def execute_dag(
    spark: SparkSession,
    dag: Dag,
    dry_run: bool = False,
    max_workers: int = 4,
    progress=print,
) -> list[StepURI]:
    """Execute dirty steps; independent steps run concurrently."""
    order = in_topological_order(dag)
    if dry_run:
        for step in order:
            progress(f"would run {step}")
        return order

    ts = TopologicalSorter({s: [d for d in dag.get(s, []) if d in dag] for s in dag})
    ts.prepare()
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {}
        while ts.is_active():
            for step in ts.get_ready():
                progress(f"running {step}")
                futures[step] = pool.submit(execute_step, spark, step, dag.get(step, []))
            if futures:
                wait(futures.values(), return_when=FIRST_COMPLETED)
            for step, fut in list(futures.items()):
                if fut.done():
                    fut.result()  # re-raise failures
                    ts.done(step)
                    del futures[step]
    return order
