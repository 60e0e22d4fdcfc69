"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process CPU 'pod'. Evaluates a shared candidate list through
run_candidates_multihost with a deterministic fake runner (one candidate
crashes on purpose) and writes its view of the gathered results to JSON —
the parent asserts every process returned the identical filtered list.
"""

import json
import os
import sys


def main():
    port, pid, nproc, out_path = sys.argv[1:5]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=int(nproc),
                               process_id=int(pid))

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mfvi_dip_mia_tpu.parallel.multihost import run_candidates_multihost
    from mfvi_dip_mia_tpu.bo.loop import _fanout_and_rank

    candidates = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0),
                  (5.0, 5.0)]

    def runner(idx, dev, cand):
        if cand[0] == 4.0:
            raise ValueError("synthetic candidate failure")
        return 10.0 * cand[0] + cand[1]

    kept_c, kept_y = run_candidates_multihost(
        "den", "mfvi", candidates, run_params={}, runner=runner)

    fanout_fn, is_main = _fanout_and_rank()
    with open(out_path, "w") as f:
        json.dump({
            "pid": int(pid),
            "kept_c": [list(c) for c in kept_c],
            "kept_y": kept_y,
            "is_main": bool(is_main),
            "routed_multihost": fanout_fn is run_candidates_multihost,
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count(),
        }, f)


if __name__ == "__main__":
    main()
