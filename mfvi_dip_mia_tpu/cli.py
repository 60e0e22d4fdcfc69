"""BO sweep CLI — parity with ``python bayesian_optimization.py``
(ref :3890-3914):

    python -m mfvi_dip_mia_tpu.cli --task denoising --bayes mfvi \
        --config configs/bo_mfvi_den.json [--resume]
"""

from __future__ import annotations

import argparse

from .bo.loop import bo
from .utils.config import load_config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--task", type=str, default="denoising")
    parser.add_argument("--bayes", type=str, default="mfvi")
    parser.add_argument("--config", type=str,
                        default="./configs/bo_den.json")
    parser.add_argument("--rounds", type=int, default=20)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the last *_fig_data.npz round")
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--num-iter", type=int, default=None,
                        help="override run_params.num_iter (smoke runs)")
    parser.add_argument("--metrics-every", type=int, default=None)
    parser.add_argument("--screen-iters", type=int, default=None,
                        help="run BO rounds at this reduced fit budget and "
                             "confirm the winner with one full-budget fit "
                             "(the measured <1h sweep mode; rank-fidelity "
                             "evidence: bo_results/mfvi_ct_timed/"
                             "rank_vs_budget.json)")
    parser.add_argument("--dist-coordinator", type=str, default=None,
                        help="host0:port — launch the identical command on "
                             "every host of a pod slice to fan BO candidates "
                             "out over DCN (parallel/multihost.py)")
    parser.add_argument("--dist-nproc", type=int, default=None)
    parser.add_argument("--dist-pid", type=int, default=None)
    args = parser.parse_args(argv)

    if args.dist_coordinator is not None:
        import jax
        jax.distributed.initialize(coordinator_address=args.dist_coordinator,
                                   num_processes=args.dist_nproc,
                                   process_id=args.dist_pid)

    from .utils.prng import configure as configure_prng
    configure_prng()  # rbg on TPU (+4-7% end-to-end), threefry elsewhere

    config = load_config(args.config)
    bo_params = {k: {"logbounds": v.logbounds, "candidates": v.candidates}
                 for k, v in config.bo_params.items()}
    run_params = dict(config.run_params)
    if args.num_iter is not None:
        run_params["num_iter"] = args.num_iter
    if args.metrics_every is not None:
        run_params["metrics_every"] = args.metrics_every
    bo(task=args.task, bayes=args.bayes, bo_params=bo_params,
       run_params=run_params, n_rounds=args.rounds,
       plot=not args.no_plot, resume=args.resume,
       screen_iters=args.screen_iters)


if __name__ == "__main__":
    main()
