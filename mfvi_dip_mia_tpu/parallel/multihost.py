"""Multi-host BO fanout over DCN (pod-scale candidate parallelism).

The reference parallelizes one BO round with a worker process per local GPU
(/root/reference/bayesian_optimization.py:3709-3775) and cannot span hosts.
On a TPU pod slice each host can only enqueue work on its own chips, so the
TPU-native layout is SPMD at the *orchestration* level:

* every host runs the SAME deterministic BO loop — ``bo/gp.py`` and
  ``bo/acquisition.py`` use no RNG, so identical observations produce
  identical GP fits and identical next-round candidates on every host;
* each round's candidate list is partitioned round-robin by
  ``jax.process_index()``;
* each host fans its share out over its *local* devices with the standard
  thread/interleave fanout (``parallel/fanout.py``);
* per-candidate scores are exchanged with one tiny ``process_allgather``
  over DCN. The only cross-host traffic per round is the (index, score)
  pairs — there is no NCCL/MPI analog to port.

Launch the identical CLI on every host with ``--dist-coordinator host0:port
--dist-nproc N --dist-pid i`` (or under a pod launcher whose environment
makes plain ``jax.distributed.initialize()`` work). ``bo()`` detects
``jax.process_count() > 1``, routes its fanout here, and writes artifacts
only on process 0.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .fanout import run_candidates


def run_candidates_multihost(task: str, bayes: str, candidates: Sequence,
                             run_params: dict, devices=None, runner=None,
                             use_spmd: bool = False,
                             interleave: str | bool = "auto",
                             sp_split: int | bool = False):
    """Evaluate ``candidates`` across every JAX process; every host returns
    the IDENTICAL (kept_candidates, kept_scores) in original candidate
    order, with NaN/crashed candidates dropped — a drop-in replacement for
    ``fanout.run_candidates`` under ``jax.distributed``.

    ``devices`` defaults to this host's local devices; explicit devices must
    be process-local. Scores cross DCN as float32 (PSNR-scale values; the
    GP re-fits in float64 from the gathered list either way).
    """
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        return run_candidates(task, bayes, candidates, run_params, devices,
                              runner, use_spmd, interleave, sp_split)
    pid = jax.process_index()
    if devices is None:
        devices = jax.local_devices()

    mine_idx = list(range(pid, len(candidates), nproc))
    mine = [candidates[i] for i in mine_idx]
    _, raw = run_candidates(task, bayes, mine, run_params, devices, runner,
                            use_spmd, interleave, sp_split, keep_nan=True)

    # fixed-size slots so every host contributes the same shapes to the
    # allgather; index -1 marks an empty slot
    slots = -(-len(candidates) // nproc)
    idx = np.full((slots,), -1, np.int32)
    score = np.full((slots,), np.nan, np.float32)
    idx[:len(mine_idx)] = np.asarray(mine_idx, np.int32)
    score[:len(raw)] = np.asarray(raw, np.float32)

    from jax.experimental import multihost_utils
    all_idx = np.asarray(multihost_utils.process_allgather(idx))
    all_score = np.asarray(multihost_utils.process_allgather(score))

    by_index = {int(i): float(y)
                for i, y in zip(all_idx.reshape(-1), all_score.reshape(-1))
                if i >= 0}
    kept_c, kept_y = [], []
    for i in sorted(by_index):
        if np.isfinite(by_index[i]):
            kept_c.append(tuple(np.asarray(candidates[i], np.float64)))
            kept_y.append(by_index[i])
        elif pid == 0:
            print(f"[fanout/multihost] candidate {candidates[i]} "
                  f"diverged/crashed; dropped", flush=True)
    return kept_c, kept_y


def check_resume_consistency(start_round: int) -> None:
    """Multi-host resume reads ``bo_results_path`` on every host; on a pod
    that path must be a shared filesystem. Verify every process resolved the
    same resume round and fail loudly otherwise (a silent mismatch would
    diverge the hosts' BO states)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    rounds = np.asarray(multihost_utils.process_allgather(
        np.asarray([start_round], np.int32))).reshape(-1)
    if not (rounds == rounds[0]).all():
        raise RuntimeError(
            "multi-host resume mismatch: processes resolved different resume "
            f"rounds {rounds.tolist()} — bo_results_path must be a shared "
            "filesystem visible to every host")
