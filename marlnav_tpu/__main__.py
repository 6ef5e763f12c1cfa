"""CLI and mode dispatch: ``python -m marlnav_tpu``.

The flag surface replicates the reference CLI (short + long names and
defaults, reference __main__.py:43-133) so any reference invocation works
unchanged; mode dispatch mirrors ``main(params, mode)``
(reference __main__.py:12-40): training (default), rendering (``-re``),
reward check (``-rc``).

TPU-native additions:
  --num-data/--num-model   device mesh axes (data/tensor parallelism)
  --multihost              jax.distributed.initialize() for pod slices
  --checkpoint-dir/--resume  full-state Orbax checkpointing with resume
  --config                 load a RunConfig from JSON (working version of
                           the reference's dead ``load_config``)
  --save-animation         render headless to a movie file
  --fixed-semantics/--use-gae  corrected-MAPPO switches (SURVEY.md §2.5)
  --staggered-resets       decorrelated episode phases (arXiv:2511.21011)
"""

from __future__ import annotations

import argparse
import sys

from marlnav_tpu.config import RunConfig, load_config_json, resolve_run_config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="marlnav_tpu",
        description="TPU-native multi-agent navigation RL (MAPPO)",
    )
    # -- general (reference __main__.py:49-70) -----------------------------
    parser.add_argument("-se", "--seed", type=int,
                        help="value of the random seed (optional).")
    parser.add_argument("-mx", "--max_x_value", type=float, default=1500.0)
    parser.add_argument("-my", "--max_y_value", type=float, default=750.0)
    parser.add_argument("-fx", "--fig_size_x", type=float, default=10.0)
    parser.add_argument("-fy", "--fig_size_y", type=float, default=5.0)
    parser.add_argument("-pi", "--parallel_index", type=int, default=0)
    parser.add_argument("-ai", "--agent_index", type=int, default=0)
    parser.add_argument("-in", "--interval", type=int, default=10)
    parser.add_argument("-ra", "--random", action="store_true",
                        help="sample policy actions when rendering")
    parser.add_argument("-w", "--weights_file", type=str,
                        help="actor weights .npz under ./weights")
    # -- env (reference __main__.py:73-102) --------------------------------
    parser.add_argument("-np", "--num_parallel", type=int, default=2)
    parser.add_argument("-na", "--num_agents", type=int, default=3)
    parser.add_argument("-no", "--num_obstacles", type=int, default=3)
    parser.add_argument("-ms", "--max_step", type=int, default=1000)
    parser.add_argument("-el", "--episode_len", type=int, default=200)
    parser.add_argument("-mis", "--min_speed", type=float, default=3.0)
    parser.add_argument("-mas", "--max_speed", type=float, default=10.0)
    parser.add_argument("-mia", "--min_accel", type=float, default=-0.5)
    parser.add_argument("-maa", "--max_accel", type=float, default=0.5)
    parser.add_argument("-rf", "--risk_factor", type=float, default=0.0)
    parser.add_argument("-df", "--distance_factor", type=float, default=0.0)
    parser.add_argument("-hf", "--heading_factor", type=float, default=500.0)
    parser.add_argument("-tf", "--target_factor", type=float, default=500.0)
    parser.add_argument("-sf", "--soft_factor", type=float, default=500.0)
    parser.add_argument("-bf", "--bond_factor", type=float, default=10.0)
    # -- model (reference __main__.py:105-122) -----------------------------
    parser.add_argument("-hs", "--hidden_size", type=int, default=50)
    parser.add_argument("-lr", "--learning_rate", type=float, default=0.001)
    parser.add_argument("-ec", "--ent_const", type=float, default=0.001)
    parser.add_argument("-ep", "--epsilon", type=float, default=0.01)
    parser.add_argument("-g", "--gamma", type=float, default=0.9)
    parser.add_argument("-nt", "--num_total", type=int, default=1_000_000)
    parser.add_argument("-bl", "--buffer_len", type=int, default=1000)
    parser.add_argument("-ne", "--num_epochs", type=int, default=50)
    parser.add_argument("-bs", "--batch_size", type=int, default=1000,
                        help="mini-batch size (<= buffer_len)")
    # -- modes (reference __main__.py:125-132) -----------------------------
    parser.add_argument("-re", "--rendering", action="store_true")
    parser.add_argument("-sa", "--sampling_style", type=str,
                        default="sampler", choices=["sampler", "policy"])
    parser.add_argument("-rc", "--reward_check", action="store_true")
    parser.add_argument("-sn", "--sampler_num", type=int, default=-1,
                        choices=[-1, 0, 1])
    # -- TPU-native extensions ---------------------------------------------
    parser.add_argument("--config", type=str,
                        help="load the full run config from a JSON file")
    parser.add_argument("--num-data", type=int, default=None,
                        help="data-parallel mesh axis (default: all devices)")
    parser.add_argument("--num-model", type=int, default=1,
                        help="tensor-parallel mesh axis")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize() for pod slices")
    parser.add_argument("--coordinator-address", type=str, default=None,
                        help="host:port of process 0 for --multihost "
                             "(default: cluster auto-detection)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="total process count for --multihost")
    parser.add_argument("--process-id", type=int, default=None,
                        help="this process's index for --multihost")
    parser.add_argument("--checkpoint-dir", type=str, default=None)
    parser.add_argument("--checkpoint-interval", type=int, default=10)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--output-root", type=str, default=None,
                        help="root for plots/ logs/ weights/ (default: cwd)")
    parser.add_argument("--jit-repeats", type=int, default=1,
                        help="full training repeats per device program "
                             "(amortizes dispatch latency; weights/"
                             "checkpoints save once per block)")
    parser.add_argument("--pipeline-repeats", action="store_true",
                        help="execute each --jit-repeats block as chained "
                             "async per-repeat dispatches instead of one "
                             "scanned program (2-3x faster first compile; "
                             "small steady-state dispatch overhead)")
    parser.add_argument("--save-animation", type=str, default=None,
                        help="write the animation to this movie/GIF file "
                             "instead of opening a window")
    parser.add_argument("--fixed-semantics", action="store_true",
                        help="corrected advantage pairing + full minibatches "
                             "instead of reference-faithful quirks")
    parser.add_argument("--use-gae", action="store_true",
                        help="bootstrapped GAE instead of zero-at-done returns")
    parser.add_argument("--fused-collect", action="store_true",
                        help="use the fused Pallas rollout kernel for "
                             "training data collection (TPU, triangle "
                             "scenarios, single chip; ~20x faster rollouts)")
    parser.add_argument("--fused-updates", action="store_true",
                        help="fused Pallas PPO-update kernels: loss + all "
                             "gradients in one streaming pass per "
                             "minibatch (Adam unchanged; works off-TPU "
                             "too — no PRNG involved)")
    parser.add_argument("--returns-f64", action="store_true",
                        help="accumulate/normalize discounted returns in "
                             "float64 (the reference's accumulator dtype; "
                             "needs JAX x64 — curve-parity studies)")
    parser.add_argument("--bf16-updates", action="store_true",
                        help="bf16 matmul operands (f32 accumulate) in the "
                             "PPO update losses — ~2x MXU throughput and "
                             "half the update-phase HBM traffic; params/"
                             "optimizer/rollout stay f32")
    parser.add_argument("--allow-interpret", action="store_true",
                        help="allow --fused-collect off-TPU (Pallas "
                             "interpreter; DEGENERATE in-kernel PRNG — "
                             "smoke tests only, never real training)")
    parser.add_argument("--staggered-resets", action="store_true",
                        help="initialize per-env episode phases uniformly so "
                             "truncations decorrelate across the batch "
                             "(arXiv:2511.21011)")
    return parser


def main(cfg: RunConfig, mode: str, args=None) -> None:
    """Mode dispatch (reference __main__.py:12-40)."""
    import jax

    from marlnav_tpu.env import make_env
    from marlnav_tpu.utils.seeding import make_rng

    if mode == "training":
        from marlnav_tpu.train import train

        mesh = None
        if args is not None and (args.num_data or args.num_model > 1
                                 or args.multihost):
            from marlnav_tpu.parallel import make_mesh

            if args.multihost:
                # Explicit coordination args when given (e.g. the
                # single-process smoke, tests/test_cli_and_io.py);
                # bare initialize() auto-detects cluster envs (TPU pod,
                # SLURM, ...).
                kw = {k: v for k, v in (
                    ("coordinator_address", args.coordinator_address),
                    ("num_processes", args.num_processes),
                    ("process_id", args.process_id)) if v is not None}
                jax.distributed.initialize(**kw)
            mesh = make_mesh(num_data=args.num_data,
                             num_model=args.num_model)
        train(
            cfg,
            mesh=mesh,
            tensor_parallel=args.num_model > 1 if args else False,
            checkpoint_dir=getattr(args, "checkpoint_dir", None),
            checkpoint_interval=getattr(args, "checkpoint_interval", 10),
            resume=getattr(args, "resume", False),
            output_root=getattr(args, "output_root", None),
            jit_repeats=getattr(args, "jit_repeats", 1),
            fused_collect=getattr(args, "fused_collect", False),
            allow_interpret=getattr(args, "allow_interpret", False),
            pipeline=getattr(args, "pipeline_repeats", False),
        )

    elif mode == "rendering":
        from marlnav_tpu.diagnostics import init_render

        env = make_env(cfg.env, cfg.init, cfg.sampler)
        rng = make_rng(cfg.seed)
        renderer = init_render(
            env, cfg.animation, normalizer_cfg=cfg.normalizer,
            scaler_cfg=cfg.scaler,
            hidden_size=cfg.animation.hidden_size, rng=rng,
        )
        save_path = getattr(args, "save_animation", None) if args else None
        renderer.run(save_path=save_path)

    elif mode == "reward_check":
        from marlnav_tpu.diagnostics import check_rews

        env = make_env(cfg.env, cfg.init, cfg.sampler)
        check_rews(env, cfg.max_step, cfg.animation.parallel_index,
                   cfg.animation.agent_index, rng=make_rng(cfg.seed))

    else:
        raise ValueError(f"unknown mode {mode!r}")


def cli(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.reward_check and args.sampling_style == "policy":
        sys.exit("reward check needs a scripted sampler, not a policy")

    # Persistent XLA compile cache: the scanned training programs cost
    # minutes to compile over the tunnel; reload them across processes.
    from marlnav_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    if args.config:
        cfg = load_config_json(args.config)
    else:
        cfg = resolve_run_config(args)

    if args.rendering:
        mode = "rendering"
    elif args.reward_check:
        mode = "reward_check"
    else:
        mode = "training"
    main(cfg, mode, args)


if __name__ == "__main__":
    cli()
