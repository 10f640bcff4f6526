"""Self-maintenance policy: when to compact, fold deltas, or repair.

The lifecycle verbs (``deletes.compact_deletes``, ``nrt.add_docs`` +
``build.reshard``, ``fsck.repair_index``) are mechanisms; a live
deployment needs the POLICY that fires them — the LSM merge-policy
analogue (size-tiered compaction) and dcs's inactivity-triggered merge
(``cmd/dcs-feeder/feeder.go:127-164`` requests a merge after 2/10 min
of quiet). Everything here reads manifest/tombstone/lineage metadata
only; no corpus data is touched until an action runs.

- ``maintenance_plan``: ordered action list with reasons —
  ``repair`` (fsck found stale shards / stats drift / tmp leftovers),
  ``compact`` (tombstones ≥ ``max_tombstone_frac`` of live docs),
  ``fold_deltas`` (unfolded delta shards ≥ ``max_delta_shards`` →
  reshard back to the configured shard count, the Lucene segment-merge
  step). A delta counts as unfolded while it is its own single-segment
  shard; after a reshard groups it with neighbors it stops counting —
  no state mutation needed, the structure IS the counter.
- ``auto_maintain``: apply the plan in order (repair first — the other
  actions assume consistent shards), returning what ran. Idempotent:
  a healthy index yields an empty plan.
"""

from __future__ import annotations


def _n_unfolded_deltas(man: dict) -> int:
    delta_segs = {r["segment"] for r in man["partitions"] if r.get("delta")}
    return sum(
        1
        for s in man["shards"]
        if len(s["segments"]) == 1 and s["segments"][0] in delta_segs
    )


def maintenance_plan(
    index_dir: str,
    max_tombstone_frac: float = 0.1,
    max_delta_shards: int = 8,
) -> list[dict]:
    from dcs_ray.index.build import load_manifest
    from dcs_ray.index.deletes import load_tombstones
    from dcs_ray.index.fsck import verify_index

    man = load_manifest(index_dir)
    plan: list[dict] = []
    rep = verify_index(index_dir)
    if rep["stale_shards"] or not rep["stats_consistent"] or rep["tmp_paths"]:
        plan.append(
            {
                "action": "repair",
                "reason": f"stale_shards={rep['stale_shards']} "
                f"stats_consistent={rep['stats_consistent']} "
                f"tmp={len(rep['tmp_paths'])}",
            }
        )
    n_docs = max(int(man["stats"]["n_docs"]), 1)
    n_dead = len(load_tombstones(index_dir))
    if n_dead and n_dead / n_docs >= max_tombstone_frac:
        plan.append(
            {
                "action": "compact",
                "reason": f"tombstones {n_dead}/{n_docs} "
                f">= {max_tombstone_frac:.0%}",
            }
        )
    n_deltas = _n_unfolded_deltas(man)
    if n_deltas >= max_delta_shards:
        plan.append(
            {
                "action": "fold_deltas",
                "reason": f"{n_deltas} unfolded delta shards >= "
                f"{max_delta_shards} (reshard to "
                f"{man['config']['num_shards']})",
            }
        )
    return plan


def auto_maintain(
    index_dir: str,
    max_tombstone_frac: float = 0.1,
    max_delta_shards: int = 8,
    task_num_cpus: float = 1.0,
) -> list[dict]:
    """Apply :func:`maintenance_plan` in order; returns the actions run
    with their metrics."""
    from dcs_ray.index.build import load_manifest, reshard
    from dcs_ray.index.deletes import compact_deletes
    from dcs_ray.index.fsck import repair_index

    ran: list[dict] = []
    for step in maintenance_plan(index_dir, max_tombstone_frac, max_delta_shards):
        if step["action"] == "repair":
            step["metrics"] = repair_index(index_dir, task_num_cpus=task_num_cpus)
        elif step["action"] == "compact":
            step["metrics"] = compact_deletes(index_dir, task_num_cpus=task_num_cpus)
        elif step["action"] == "fold_deltas":
            man = load_manifest(index_dir)
            new_man = reshard(index_dir, int(man["config"]["num_shards"]))
            step["metrics"] = new_man["metrics"]["last_reshard"]
        ran.append(step)
    return ran
