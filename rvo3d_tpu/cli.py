"""Command-line entry points: train / eval / worldgen / bench / render / parity.

Replaces the reference's script-per-task layout (train_process.py,
policy_test.py, gym_env_test.py, path_planning_main.py, create_gif.py) with
one `python -m rvo3d_tpu.cli <cmd>` tool. Every run directory gets the full
config as JSON (the reference pickles its argparse Namespace,
train_process.py:106-115) plus JSONL metrics and Orbax checkpoints.

Run-dir versioning mirrors the reference's r{N}_{i} counter scheme
(train_process.py:81-87).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _eval_suffix(m: dict) -> str:
    """Episode-count context for persisted eval lines: a truncated eval
    (chunk budget exhausted before num_episodes completed) must be
    distinguishable in results.txt, not just on stdout (ADVICE r3)."""
    if m.get("truncated"):
        return f" [TRUNCATED: {m['episodes']} episodes]"
    return ""


def _fresh_run_dir(root: str, tag: str) -> str:
    os.makedirs(root, exist_ok=True)
    i = 0
    while os.path.exists(os.path.join(root, f"{tag}_{i}")):
        i += 1
    path = os.path.join(root, f"{tag}_{i}")
    os.makedirs(path)
    return path


def _policy_controller(ac, params, env_p, action_mode="increment",
                       acceler_vel=1.0, std_factor=1e-3, seed=0):
    """controller(state, world) -> absolute action for render/record paths,
    applying the SAME action mapping as training/eval ('increment' =
    acceler*a + vel, post_train.py:72-74; 'direct' = raw command)."""
    import jax
    import jax.numpy as jnp

    from rvo3d_tpu.env.env import observe
    from rvo3d_tpu.models import ActorCritic

    key_holder = [jax.random.PRNGKey(seed)]

    def controller(state, world):
        out, _ = observe(world, state, env_p)
        key_holder[0], k = jax.random.split(key_holder[0])
        ps = ac.apply(params, k, out.obs_self, out.obs_nbr, out.obs_mask,
                      std_factor, method=ActorCritic.step)
        a = jnp.round(ps.action, 2)
        if action_mode == "direct":
            return a
        return acceler_vel * a + state.vel

    return controller


def _dump_training_gif(ac, params, wd, cfg, media_dir: str, epoch: int,
                       steps: int = 60) -> str:
    """Record one episode of the current policy and write
    media_dir/epoch_{N}.gif (+ its frames under media_dir/epoch_{N}/)."""
    import dataclasses

    from rvo3d_tpu.env import DroneEnv
    from rvo3d_tpu.render import ScenePlotter, frames_to_gif, record_trajectory

    env_p = dataclasses.replace(cfg.env, noise=False)
    env = DroneEnv(wd.spec(), env_p)
    controller = _policy_controller(ac, params, env_p,
                                    action_mode=cfg.train.action_mode)
    traj = record_trajectory(env, controller, steps=steps)
    frame_dir = os.path.join(media_dir, f"epoch_{epoch}")
    os.makedirs(frame_dir, exist_ok=True)
    plotter = ScenePlotter(wd.map_size, wd.building_list, wd.waypoints_list)
    try:
        frames = plotter.render_trajectory(traj, frame_dir, every=2)
        gif = frames_to_gif(frames,
                            os.path.join(media_dir, f"epoch_{epoch}.gif"))
    finally:
        plotter.close()
    return gif


def _build_cfg(args) -> "Config":
    from rvo3d_tpu.config import (Config, EnvParams, MeshConfig, ModelConfig,
                                  TrainConfig)
    from rvo3d_tpu.worlds import load_world

    wd = load_world(args.world)
    env = EnvParams(num_drones=wd.drone_num,
                    neighbor_num=args.neighbors_num,
                    mov_p_dest=args.p_dest,
                    mov_p_way=args.p_way,
                    mov_p_progress=args.p_progress,
                    safe_rewards=not args.unsafe_rewards,
                    noise=getattr(args, "train_noise", False),
                    control_std=getattr(args, "train_control_std", 0.06))
    model = ModelConfig(rnn_hidden_dim=args.rnn_hidden_dim,
                        rnn_mode=args.rnn_mode,
                        log_std_init=args.log_std_init,
                        use_pallas_gru=args.pallas_gru)
    train = TrainConfig(
        pi_lr=args.pi_lr, vf_lr=args.vf_lr, train_epoch=args.train_epoch,
        steps_per_epoch=args.steps_per_epoch, max_ep_len=args.max_ep_len,
        gamma=args.gamma, lam=args.lam, clip_ratio=args.clip_ratio,
        train_pi_iters=args.train_pi_iters, train_v_iters=args.train_v_iters,
        target_kl=args.target_kl, max_update_num=args.max_update_num,
        seed=args.seed, save_freq=args.save_freq, num_envs=args.num_envs,
        adv_norm=args.adv_norm, ent_coef=args.ent_coef,
        action_mode=args.action_mode, fresh_logp=args.fresh_logp,
        value_clip=args.value_clip, batched_update=args.batched_update,
        minibatch=args.minibatch,
        vf_encoder=not getattr(args, "vf_no_encoder", False),
        freeze_encoder=getattr(args, "freeze_encoder", False),
    )
    return Config(env=env, model=model, train=train,
                  mesh=MeshConfig(data=args.mesh_data, model=args.mesh_model),
                  world=args.world), wd


def cmd_train(args) -> int:
    import jax

    from rvo3d_tpu.algo.trainer import Trainer
    from rvo3d_tpu.config import to_dict
    from rvo3d_tpu.parallel import make_mesh, shard_carry, shard_params_tp
    from rvo3d_tpu.parallel.sharding import replicate
    from rvo3d_tpu.parallel.mesh import maybe_distributed_init
    from rvo3d_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    from rvo3d_tpu.utils.metrics import (JSONLLogger, plot_reward_curves,
                                         write_reward_csv)

    maybe_distributed_init()
    cfg, wd = _build_cfg(args)
    if args.bc_slowdown and args.bc_expert != "rvo":
        raise SystemExit("--bc_slowdown only affects the 'rvo' expert "
                         "(algo/bc.py collect_demos); pass --bc_expert rvo "
                         "or drop the flag")
    if args.bc_margin is not None and args.bc_expert != "rvo":
        raise SystemExit("--bc_margin only affects the 'rvo' expert; pass "
                         "--bc_expert rvo or drop the flag")
    # Sequential-update TPU fault guard: the reference-faithful per-agent
    # update program (fori over agents x KL while_loop) reproducibly dies
    # with `UNAVAILABLE: TPU device error` at N>=8 on the axon backend
    # (RESULTS.md "Platform fault"; minimized repro:
    # scripts/tpu_seqfault_repro.py). The batched joint update trains the
    # same worlds to 100 % — fall back to it with a warning instead of
    # letting the user walk into the crash. --force_sequential overrides.
    if (not cfg.train.batched_update and wd.drone_num >= 8
            and jax.default_backend() != "cpu"
            and not args.force_sequential):
        import dataclasses as _dc_guard

        print("WARNING: sequential per-agent PPO updates fault the axon "
              f"TPU backend at N={wd.drone_num} (UNAVAILABLE device error; "
              "scripts/tpu_seqfault_repro.py). Auto-switching to "
              "--batched_update; pass --force_sequential to insist.")
        cfg = cfg.replace(
            train=_dc_guard.replace(cfg.train, batched_update=True))
    run_dir = args.run_dir or _fresh_run_dir(
        "runs", f"r{wd.drone_num}")
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(to_dict(cfg), f, indent=2)
    print(f"run dir: {run_dir}")

    # multi-scenario training (BASELINE ladder rung 5's learner half):
    # lane e steps scenario world_idx[e]; every scenario must share the
    # agent count N (static shape). 'name:rev' = route-reversed variant.
    lane_specs = None
    if args.multi_worlds:
        import numpy as np

        from rvo3d_tpu.worlds import load_world
        from rvo3d_tpu.worlds.multi import (reverse_routes, stack_worlds,
                                            worlds_for_lanes)

        lane_specs = []
        for tok in args.multi_worlds.split(","):
            rev = tok.endswith(":rev")
            sp = load_world(tok[:-4] if rev else tok).spec()
            lane_specs.append((tok, reverse_routes(sp) if rev else sp))
        if any(sp.num_drones != wd.drone_num for _, sp in lane_specs):
            raise SystemExit(
                "--multi_worlds requires every scenario to share "
                f"--world's drone count ({wd.drone_num})")
        idx = np.arange(cfg.train.num_envs) % len(lane_specs)
        lane_worlds = worlds_for_lanes(
            stack_worlds([sp for _, sp in lane_specs]), idx)
        print("multi-scenario lanes: "
              + ", ".join(f"{tok} x{int((idx == i).sum())}"
                          for i, (tok, _) in enumerate(lane_specs)))
        trainer = Trainer(cfg, wd.spec(), lane_worlds=lane_worlds)
    else:
        trainer = Trainer(cfg, wd.spec())

    resumed = False
    if args.resume:
        # elastic restart: '--resume auto' continues from this run dir's
        # latest checkpoint if one exists (fresh start otherwise). A ckpt
        # dir may exist yet hold no steps (a run that died before its
        # first save) — auto mode must fall through to a fresh start
        # then, not crash (measured: runs/w8_r4 device-fault rerun).
        resume_dir = (os.path.join(run_dir, "ckpt")
                      if args.resume == "auto" else args.resume)
        if args.resume != "auto" or os.path.isdir(resume_dir):
            try:
                trainer.ppo_state, start = restore_checkpoint(
                    resume_dir, trainer.ppo_state,
                    epoch=args.resume_epoch,
                    params_only=args.resume_params_only)
                resumed = True
                print(f"resumed from {resume_dir} @ epoch {start}"
                      + (" (params only, fresh optimizers)"
                         if args.resume_params_only else ""))
            except FileNotFoundError:
                if args.resume != "auto":
                    raise
                print(f"resume auto: no steps in {resume_dir}; fresh start")
    if not resumed and args.bc_steps:
        from rvo3d_tpu.algo.bc import bc_pretrain

        # multi-scenario: every BC/DAgger round collects demos from EVERY
        # scenario into one aggregate set and fits jointly (sequential
        # per-scenario fits left an ordering bias PPO amplified —
        # runs/w32_multi oscillated 0/100 % per population)
        bc_worlds = ([sp for _, sp in lane_specs]
                     if lane_specs else trainer.world)
        params, bc_loss = bc_pretrain(
            trainer.ac, trainer.ppo_state.params, bc_worlds, cfg.env,
            jax.random.PRNGKey(cfg.train.seed + 1),
            num_envs=min(cfg.train.num_envs, 32),
            train_steps=args.bc_steps, expert=args.bc_expert,
            action_mode=cfg.train.action_mode,
            explore_std=args.bc_noise, expert_margin=args.bc_margin,
            dagger_rounds=args.bc_dagger, demo_steps=args.bc_demo_steps,
            conflict_weight=args.bc_conflict_weight,
            expert_slowdown=args.bc_slowdown,
            env_noise=args.bc_env_noise,
        )
        trainer.ppo_state = trainer.ppo_state._replace(params=params)
        scen = (", ".join(tok for tok, _ in lane_specs)
                if lane_specs else args.world)
        print(f"BC warm start [{scen}]: {args.bc_steps} steps "
              f"(dagger={args.bc_dagger}, noise={args.bc_noise}, "
              f"margin={args.bc_margin}, "
              f"cw={args.bc_conflict_weight}), final loss {bc_loss:.4f}")

    n_dev = len(jax.devices())
    if cfg.mesh.data * cfg.mesh.model > 1 or (args.auto_mesh and n_dev > 1):
        data = cfg.mesh.data if cfg.mesh.data > 1 else n_dev // cfg.mesh.model
        mesh = make_mesh(data=data, model=cfg.mesh.model)
        trainer.ppo_state = trainer.ppo_state._replace(
            params=shard_params_tp(trainer.ppo_state.params, mesh),
            pi_opt=replicate(trainer.ppo_state.pi_opt, mesh),
            vf_opt=replicate(trainer.ppo_state.vf_opt, mesh),
        )
        trainer.carry = shard_carry(trainer.carry, mesh, cfg.train.num_envs)
        print(f"mesh: {dict(mesh.shape)}")

    logger = JSONLLogger(os.path.join(run_dir, "train.jsonl"),
                         echo=not args.quiet)
    ckpt_dir = os.path.join(run_dir, "ckpt")

    def save(epoch, state):
        save_checkpoint(ckpt_dir, epoch, state, cfg)

    # goal-threshold curriculum: "--curriculum 1.2:80,0.8:80,0.4:rest"
    # experiences arrivals early at a fat threshold, then tightens to the
    # reference's 0.4 — each stage recompiles once and reuses the PPO state.
    if args.curriculum:
        if lane_specs:
            raise SystemExit("--curriculum and --multi_worlds are not "
                             "combinable (the curriculum path rebuilds the "
                             "trainer per stage on the single world)")
        import dataclasses as _dc
        import dataclasses as _dc2

        from rvo3d_tpu.algo.evaluator import evaluate

        stages = []
        for part in args.curriculum.split(","):
            thr, eps = part.split(":")
            stages.append((float(thr), None if eps == "rest" else int(eps)))
        # the run's "final" threshold is the LAST stage's, not a hard-coded
        # 0.4 — a curriculum targeting another threshold evaluates there
        final_thr = stages[-1][0]
        logger = JSONLLogger(os.path.join(run_dir, "train.jsonl"),
                             echo=not args.quiet)
        ckpt_dir = os.path.join(run_dir, "ckpt")
        done_epochs = 0
        state = trainer.ppo_state
        for thr, eps in stages:
            budget = args.train_epoch - done_epochs
            remaining = budget if eps is None else min(eps, budget)
            if remaining <= 0:
                break
            cfg_stage = cfg.replace(env=_dc.replace(cfg.env,
                                                    goal_threshold=thr))
            trainer = Trainer(cfg_stage, wd.spec())
            trainer.ppo_state = state
            print(f"curriculum stage: goal_threshold={thr} for "
                  f"{remaining} epochs")

            def log_stage(m, base=done_epochs, thr=thr):
                m["epoch"] = base + m["epoch"]
                m["goal_threshold"] = thr
                logger.log(m)

            def eval_stage(e, s, base=done_epochs, tr=trainer,
                           p_stage=cfg_stage.env):
                m = evaluate(tr.ac, s.params, tr.world, p_stage,
                             jax.random.PRNGKey(base + e),
                             num_episodes=args.eval_episodes, num_lanes=8,
                             std_factor=cfg.train.std_factor_eval,
                             action_mode=cfg.train.action_mode)
                line = (f"epoch {base + e} (stage thr={p_stage.goal_threshold}):"
                        f" success {m['success_rate']:.2%} "
                        f"EpLen {m['mean_ep_len']}±{m['std_ep_len']}"
                        + _eval_suffix(m))
                print(line)
                with open(os.path.join(run_dir, "results.txt"), "a") as f:
                    f.write(line + "\n")

            trainer.train(epochs=remaining - 1, log_fn=log_stage,
                          checkpoint_fn=lambda e, s: save_checkpoint(
                              ckpt_dir, done_epochs + e, s, cfg_stage),
                          eval_fn=eval_stage)
            state = trainer.ppo_state
            done_epochs += remaining
            # end-of-stage eval at the stage threshold AND the final stage's
            for thr_eval in sorted({thr, final_thr}):
                p_eval = _dc2.replace(cfg.env, goal_threshold=thr_eval)
                m = evaluate(trainer.ac, state.params, trainer.world,
                             p_eval, jax.random.PRNGKey(done_epochs),
                             num_episodes=args.eval_episodes, num_lanes=8,
                             std_factor=cfg.train.std_factor_eval,
                             action_mode=cfg.train.action_mode)
                line = (f"stage thr={thr} done (epoch {done_epochs}): "
                        f"eval@{thr_eval} success {m['success_rate']:.2%} "
                        f"EpLen {m['mean_ep_len']}±{m['std_ep_len']}"
                        + _eval_suffix(m))
                print(line)
                with open(os.path.join(run_dir, "results.txt"), "a") as f:
                    f.write(line + "\n")
        write_reward_csv(os.path.join(run_dir, "reward_curves.csv"),
                         logger.read())
        plot_reward_curves(os.path.join(run_dir, "train.jsonl"),
                           os.path.join(run_dir, "reward_curves.png"))
        return 0

    # always installed: the trainer scores EVERY persisted checkpoint (and
    # the rescue state on a halt) so no run ends scoreless, --eval_every
    # just adds a denser cadence (round-2 lesson: w2_curr4 died with 5
    # checkpoints and no results.txt).
    from rvo3d_tpu.algo.evaluator import evaluate

    results_path = os.path.join(run_dir, "results.txt")

    # best-checkpoint tracking: deterministic-adjacent PPO fine-tuning can
    # DECAY det success in later epochs while rollout returns improve
    # (measured: w3 epoch-30 collapse, w8 oscillation, w4/w32 early-epoch
    # peaks — RESULTS.md). Since every persisted checkpoint is kept, record
    # which one scored best so eval/serving pick it without archaeology.
    best = {"epoch": None, "success": -1.0}

    def eval_fn(epoch, state, saved=True):
        # multi-scenario: one results.txt line per scenario population
        targets = lane_specs or [(None, trainer.world)]
        min_success = 2.0
        for tok, sp in targets:
            m = evaluate(trainer.ac, state.params, sp, cfg.env,
                         jax.random.PRNGKey(epoch),
                         num_episodes=args.eval_episodes,
                         num_lanes=8, std_factor=cfg.train.std_factor_eval,
                         action_mode=cfg.train.action_mode)
            tag = f" [{tok}]" if tok is not None else ""
            line = (f"epoch {epoch}{tag}: success {m['success_rate']:.2%} "
                    f"EpLen {m['mean_ep_len']}±{m['std_ep_len']} "
                    f"speed {m['mean_speed']}±{m['std_speed']}"
                    + _eval_suffix(m))
            print(line)
            with open(results_path, "a") as f:
                f.write(line + "\n")
            min_success = min(min_success, m["success_rate"])
        # a multi-scenario checkpoint is only as good as its WORST
        # population. Only PERSISTED epochs may become "best": an
        # --eval_every cadence epoch without a checkpoint would leave a
        # hint command that fails to restore (ADVICE r4).
        if saved and min_success > best["success"]:
            best.update(epoch=epoch, success=min_success)
        with open(os.path.join(run_dir, "best_checkpoint.json"), "w") as f:
            json.dump({"epoch": best["epoch"],
                       "min_success_rate": best["success"],
                       "hint": f"cli eval --checkpoint {run_dir} "
                               f"--ckpt_epoch {best['epoch']}"}, f, indent=1)

    def log_fn(m):
        logger.log(m)
        # --render_every K: the reference renders inside the training loop
        # every render_freq epochs (multi_ppo.py:213-214, env_base.py:155-
        # 162); here the renderer stays out of the env — every K epochs a
        # trajectory of the CURRENT policy is recorded and rendered to a
        # GIF in the run dir (host-side, rendering failures never kill the
        # run).
        ep = m.get("epoch")
        if (args.render_every and ep is not None and "halted" not in m
                and ep % args.render_every == 0):
            try:
                gif = _dump_training_gif(
                    trainer.ac, trainer.ppo_state.params, wd, cfg,
                    os.path.join(run_dir, "media"), ep)
                print(f"render_every: epoch {ep} -> {gif}")
            except Exception as exc:  # noqa: BLE001 - rendering is best-effort
                print(f"render_every: epoch {ep} render failed: {exc!r}")

    trainer.train(epochs=args.train_epoch, log_fn=log_fn,
                  checkpoint_fn=save, eval_fn=eval_fn,
                  eval_every=args.eval_every)
    write_reward_csv(os.path.join(run_dir, "reward_curves.csv"),
                     logger.read())
    plot_reward_curves(os.path.join(run_dir, "train.jsonl"),
                       os.path.join(run_dir, "reward_curves.png"))
    return 0


def cmd_eval(args) -> int:
    import jax

    from rvo3d_tpu.algo.evaluator import evaluate
    from rvo3d_tpu.config import ModelConfig, EnvParams
    from rvo3d_tpu.models import ActorCritic
    from rvo3d_tpu.worlds import load_world

    wd = load_world(args.world)
    eval_spec = wd.spec()
    if getattr(args, "reverse", False):
        # score the route-reversed scenario population of a
        # --multi_worlds 'name:rev' training run
        from rvo3d_tpu.worlds.multi import reverse_routes

        eval_spec = reverse_routes(eval_spec)
    env_p = EnvParams(num_drones=wd.drone_num)
    import dataclasses

    if args.goal_threshold is not None:
        # score a mid-curriculum policy at its trained arrival threshold
        env_p = dataclasses.replace(env_p, goal_threshold=args.goal_threshold)
    if args.noise:
        # robustness eval: injected control noise makes the episodes
        # genuinely distinct (the deterministic env + identical lane resets
        # otherwise replicate ~1 episode — see RESULTS.md degeneracy note)
        env_p = dataclasses.replace(env_p, noise=True,
                                    control_std=args.control_std)

    if args.torch_checkpoint:
        from rvo3d_tpu.utils.torch_import import load_reference_policy

        params = load_reference_policy(args.torch_checkpoint,
                                       rnn_mode=args.rnn_mode)
        cfg_m = ModelConfig(rnn_mode=args.rnn_mode)
        ac = ActorCritic(cfg_m)
    else:
        from rvo3d_tpu.algo.trainer import Trainer
        from rvo3d_tpu.utils.checkpoint import load_config, restore_checkpoint

        cfg = load_config(os.path.dirname(args.checkpoint.rstrip("/"))
                          if args.checkpoint.endswith("ckpt")
                          else args.checkpoint)
        trainer = Trainer(cfg, wd.spec())
        ckpt = args.checkpoint if args.checkpoint.endswith("ckpt") else \
            os.path.join(args.checkpoint, "ckpt")
        state, epoch = restore_checkpoint(ckpt, trainer.ppo_state,
                                          epoch=args.ckpt_epoch)
        params = state.params
        ac = trainer.ac
        args.action_mode = cfg.train.action_mode  # match the training mapping
        print(f"evaluating epoch {epoch} (action_mode={args.action_mode})")

    m = evaluate(ac, params, eval_spec, env_p, jax.random.PRNGKey(args.seed),
                 num_episodes=args.episodes, num_lanes=args.lanes,
                 max_ep_len=args.max_ep_len, acceler_vel=args.acceler_vel,
                 std_factor=args.std_factor, action_mode=args.action_mode)
    noise_tag = (f" noise=on(std={args.control_std})" if args.noise else "")
    if getattr(args, "reverse", False):
        noise_tag = " routes=reversed" + noise_tag
    line = (f"world={args.world}{noise_tag} "
            f"success_rate={m['success_rate']:.2%} "
            f"EpLen={m['mean_ep_len']}±{m['std_ep_len']} "
            f"speed={m['mean_speed']}±{m['std_speed']} "
            f"ret0={m['mean_ret0']:.2f} ({m['episodes']} episodes"
            + (", TRUNCATED" if m.get("truncated") else "") + ")")
    print(line)
    if args.results_file:
        with open(args.results_file, "a") as f:
            f.write(line + "\n")
    return 0


def cmd_worldgen(args) -> int:
    from rvo3d_tpu.worlds.gen import generate_world

    wd = generate_world(args.name, num_drones=args.drones,
                        map_size=tuple(args.map_size), seed=args.seed,
                        k_sigma=args.k_sigma, n_low=args.n_low)
    out = os.path.join(args.out, args.name)
    wd.save(out)
    print(f"world '{args.name}' -> {out}: {wd.drone_num} drones, "
          f"{len(wd.building_list)} buildings, "
          f"routes {[len(w) for w in wd.waypoints_list]} waypoints")
    return 0


def cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"), run_name="__main__")
    return 0


def cmd_render(args) -> int:
    from rvo3d_tpu.config import EnvParams
    from rvo3d_tpu.env import DroneEnv
    from rvo3d_tpu.render import ScenePlotter, frames_to_gif, record_trajectory
    from rvo3d_tpu.utils import waypoint_controller
    from rvo3d_tpu.worlds import load_world

    wd = load_world(args.world)
    env = DroneEnv(wd.spec(), EnvParams(num_drones=wd.drone_num))

    if args.torch_checkpoint or args.checkpoint:
        from rvo3d_tpu.config import ModelConfig
        from rvo3d_tpu.models import ActorCritic

        action_mode = "increment"
        if args.torch_checkpoint:
            from rvo3d_tpu.utils.torch_import import load_reference_policy

            params = load_reference_policy(args.torch_checkpoint)
            ac = ActorCritic(ModelConfig())
        else:
            from rvo3d_tpu.algo.trainer import Trainer
            from rvo3d_tpu.utils.checkpoint import load_config, restore_checkpoint

            cfg = load_config(args.checkpoint)
            trainer = Trainer(cfg, wd.spec())
            state, ep = restore_checkpoint(
                os.path.join(args.checkpoint, "ckpt"), trainer.ppo_state,
                epoch=args.ckpt_epoch)
            print(f"rendering checkpoint epoch {ep}")
            params, ac = state.params, trainer.ac
            # a 'direct'-mode checkpoint rendered through the increment
            # mapping flies garbage — match the training mapping
            action_mode = cfg.train.action_mode

        controller = _policy_controller(ac, params, env.params,
                                        action_mode=action_mode,
                                        acceler_vel=args.acceler_vel)
    else:
        controller = waypoint_controller

    traj = record_trajectory(env, controller, steps=args.steps)
    plotter = ScenePlotter(wd.map_size, wd.building_list, wd.waypoints_list)
    frames = plotter.render_trajectory(traj, args.out, every=args.every,
                                       draw_cones=args.cones)
    gif = frames_to_gif(frames, os.path.join(args.out, "episode.gif"))
    mp4 = None
    if not args.no_mp4:
        from rvo3d_tpu.render import frames_to_mp4

        mp4 = frames_to_mp4(frames, os.path.join(args.out, "episode.mp4"))
    plotter.close()
    print(f"{len(frames)} frames -> {args.out}"
          + (f", gif: {gif}" if gif else "")
          + (f", mp4: {mp4}" if mp4 else ""))
    return 0


def cmd_parity(args) -> int:
    from rvo3d_tpu.parity import run_parity

    return run_parity(worlds=args.worlds, steps=args.steps, x64=args.x64,
                      seed=args.seed, env_train=not args.eval_mode,
                      noise=args.noise)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rvo3d_tpu",
                                description=__doc__.splitlines()[0])
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the container pins the "
                        "tunneled TPU; env vars alone don't override it)")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a policy")
    t.add_argument("--world", default="world_3")
    t.add_argument("--run_dir", default=None)
    t.add_argument("--resume", default=None, help="checkpoint dir to resume")
    t.add_argument("--resume_epoch", type=int, default=None,
                   help="checkpoint epoch to resume from (default: latest) "
                        "— e.g. 0 resumes a run's BC-clone initialization")
    t.add_argument("--resume_params_only", action="store_true",
                   help="restore only the params and start FRESH optimizers "
                        "(required when the optimizer masks change, e.g. "
                        "--vf_no_encoder / --freeze_encoder fine-tunes of a "
                        "shared-encoder checkpoint)")
    t.add_argument("--num_envs", type=int, default=16)
    t.add_argument("--train_epoch", type=int, default=600)
    t.add_argument("--steps_per_epoch", type=int, default=300)
    t.add_argument("--max_ep_len", type=int, default=500)
    t.add_argument("--pi_lr", type=float, default=4e-6)
    t.add_argument("--vf_lr", type=float, default=5e-5)
    t.add_argument("--gamma", type=float, default=0.99)
    t.add_argument("--lam", type=float, default=0.97)
    t.add_argument("--clip_ratio", type=float, default=0.2)
    t.add_argument("--train_pi_iters", type=int, default=50)
    t.add_argument("--train_v_iters", type=int, default=50)
    t.add_argument("--target_kl", type=float, default=0.05)
    t.add_argument("--max_update_num", type=int, default=10)
    t.add_argument("--seed", type=int, default=7)
    t.add_argument("--save_freq", type=int, default=50)
    t.add_argument("--rnn_hidden_dim", type=int, default=256)
    t.add_argument("--rnn_mode", default="biGRU",
                   choices=["GRU", "biGRU", "LSTM"])
    t.add_argument("--neighbors_num", type=int, default=10)
    t.add_argument("--p_dest", type=float, default=20.0,
                   help="destination-arrival reward (reference: 20; the "
                        "reference's value makes perpetual cruising optimal "
                        "at gamma=0.99 — raise to make arrival dominate)")
    t.add_argument("--p_way", type=float, default=3.0)
    t.add_argument("--p_progress", type=float, default=0.0,
                   help="progress shaping toward the active waypoint "
                        "(the reference's disabled progress term, working)")
    t.add_argument("--log_std_init", type=float, default=-1.0)
    t.add_argument("--bc_steps", type=int, default=0,
                   help="behavior-cloning warm start steps from the "
                        "analytic controller before PPO (0 = off)")
    t.add_argument("--bc_expert", default="waypoint",
                   choices=["waypoint", "rvo"])
    t.add_argument("--bc_dagger", type=int, default=0,
                   help="DAgger rounds after the initial BC fit (roll the "
                        "clone, relabel with the expert, refit)")
    t.add_argument("--bc_noise", type=float, default=0.0,
                   help="DART exploration noise std on executed demo "
                        "actions (labels stay clean)")
    t.add_argument("--bc_margin", type=float, default=None,
                   help="RVO expert safety-margin inflation for demos")
    t.add_argument("--bc_demo_steps", type=int, default=200)
    t.add_argument("--bc_env_noise", action="store_true",
                   help="inject the eval's control noise (std = "
                        "--train_control_std) during BC demo collection: "
                        "the expert relabels every noise-displaced state, "
                        "so the clone trains on the noise distribution the "
                        "--noise eval scores it under")
    t.add_argument("--bc_slowdown", action="store_true",
                   help="RVO expert aims to LAND on the active waypoint "
                        "when one step away (fixes the orbit limit cycle "
                        "on world16_dense; breaks world_8 — per-world)")
    t.add_argument("--bc_conflict_weight", type=float, default=1.0,
                   help="upweight BC samples with flagged VO neighbors "
                        "(the dodge states that decide episodes; 1 = off)")
    t.add_argument("--adv_norm", action="store_true",
                   help="standardize advantages (extension; off = reference)")
    t.add_argument("--ent_coef", type=float, default=0.0)
    t.add_argument("--fresh_logp", action="store_true",
                   help="recompute behavior logp under current params before "
                        "each agent's policy phase (fixes the stale-logp "
                        "pi_iters==0 dropped-update pathology; off = reference)")
    t.add_argument("--value_clip", type=float, default=0.0,
                   help="PPO2-style value clipping range (0 = reference MSE)")
    t.add_argument("--vf_no_encoder", action="store_true",
                   help="exclude the shared encoder from the vf optimizer "
                        "(critic-head-only value updates; the reference "
                        "trains the encoder at vf_lr through the value loss "
                        "too, policy_rnn_ac.py:46-54 — the round-5 fine-tune "
                        "collapse root cause)")
    t.add_argument("--freeze_encoder", action="store_true",
                   help="exclude the encoder from BOTH optimizers "
                        "(fine-tune heads only on a frozen clone encoder)")
    t.add_argument("--force_sequential", action="store_true",
                   help="run the sequential per-agent update schedule on "
                        "TPU even at N>=8 (known axon backend fault — "
                        "scripts/tpu_seqfault_repro.py)")
    t.add_argument("--render_every", type=int, default=0,
                   help="every K epochs, record one episode of the current "
                        "policy and drop media/epoch_K.gif in the run dir "
                        "(the reference's in-training render_freq, "
                        "multi_ppo.py:213-214; 0 = off)")
    t.add_argument("--train_noise", action="store_true",
                   help="inject per-step control noise during training "
                        "rollouts (EnvParams.noise, drone.py:79-82) — "
                        "robustifies the learned policy against the noisy "
                        "eval (--noise); off = reference default")
    t.add_argument("--train_control_std", type=float, default=0.06)
    t.add_argument("--multi_worlds", default=None,
                   help="comma list of world names ('name:rev' = route-"
                        "reversed variant) sharing --world's drone count; "
                        "lane e trains scenario e %% K and eval reports "
                        "each population separately")
    t.add_argument("--minibatch", type=int, default=0,
                   help="pi/v iteration minibatch size (0 = reference "
                        "full-batch; >0 = random contiguous windows, the "
                        "fast path at num_envs >= 1024)")
    t.add_argument("--batched_update", action="store_true",
                   help="fast mode: one joint PPO update over all agents "
                        "instead of the sequential per-agent schedule")
    t.add_argument("--unsafe_rewards", action="store_true",
                   help="reproduce the reference's unguarded inf reward "
                        "(parity experiments only; NaN-poisons training)")
    t.add_argument("--action_mode", default="increment",
                   choices=["increment", "direct"],
                   help="'increment' = reference velocity-anchored mapping; "
                        "'direct' = policy commands [acc, dyaw, dpitch]")
    t.add_argument("--pallas_gru", action="store_true",
                   help="use the fused Pallas GRU kernel on TPU")
    t.add_argument("--mesh_data", type=int, default=1)
    t.add_argument("--mesh_model", type=int, default=1)
    t.add_argument("--auto_mesh", action="store_true")
    t.add_argument("--quiet", action="store_true")
    t.add_argument("--eval_every", type=int, default=0,
                   help="run evaluation every N epochs (0 = off)")
    t.add_argument("--curriculum", default=None,
                   help="goal-threshold schedule, e.g. '1.2:80,0.8:80,0.4:rest'")
    t.add_argument("--eval_episodes", type=int, default=40)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="evaluate a policy")
    e.add_argument("--world", default="world_3")
    e.add_argument("--checkpoint", default=None, help="run dir with ckpt/")
    e.add_argument("--torch_checkpoint", default=None,
                   help="reference .pt checkpoint")
    e.add_argument("--rnn_mode", default="biGRU")
    e.add_argument("--episodes", type=int, default=100)
    e.add_argument("--lanes", type=int, default=16)
    e.add_argument("--max_ep_len", type=int, default=150)
    e.add_argument("--acceler_vel", type=float, default=1.0)
    e.add_argument("--std_factor", type=float, default=1e-3)
    e.add_argument("--goal_threshold", type=float, default=None,
                   help="override arrival threshold (e.g. to score a "
                        "mid-curriculum checkpoint at its trained stage)")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--ckpt_epoch", type=int, default=None,
                   help="checkpoint epoch to load (default: latest)")
    e.add_argument("--noise", action="store_true",
                   help="inject per-step control noise (EnvParams.noise, "
                        "drone.py:79-82) so eval episodes are distinct")
    e.add_argument("--control_std", type=float, default=0.06)
    e.add_argument("--reverse", action="store_true",
                   help="evaluate on the route-reversed scenario variant "
                        "(--multi_worlds 'name:rev' populations)")
    e.add_argument("--results_file", default=None)
    e.add_argument("--action_mode", default="increment",
                   choices=["increment", "direct"])
    e.set_defaults(fn=cmd_eval)

    w = sub.add_parser("worldgen", help="generate a world")
    w.add_argument("--name", required=True)
    w.add_argument("--drones", type=int, default=4)
    w.add_argument("--map_size", type=int, nargs=3, default=[12, 12, 6])
    w.add_argument("--seed", type=int, default=0)
    w.add_argument("--k_sigma", type=float, default=2.0)
    w.add_argument("--n_low", type=int, default=1)
    w.add_argument("--out", default="worlds_data")
    w.set_defaults(fn=cmd_worldgen)

    b = sub.add_parser("bench", help="run the benchmark")
    b.set_defaults(fn=cmd_bench)

    r = sub.add_parser("render",
                       help="render an episode to frames + gif + mp4")
    r.add_argument("--world", default="world_3")
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--torch_checkpoint", default=None)
    r.add_argument("--ckpt_epoch", type=int, default=None,
                   help="checkpoint epoch to render (default: latest) — "
                        "pair with best_checkpoint.json's epoch")
    r.add_argument("--acceler_vel", type=float, default=1.0)
    r.add_argument("--steps", type=int, default=100)
    r.add_argument("--every", type=int, default=2)
    r.add_argument("--out", default="render_out")
    r.add_argument("--cones", action="store_true",
                   help="overlay live VO cones decoded from the logged "
                        "observation blocks (env_plot.draw_cone analogue)")
    r.add_argument("--no_mp4", action="store_true")
    r.set_defaults(fn=cmd_render)

    pa = sub.add_parser("parity", help="fixed-seed parity check vs the oracle")
    pa.add_argument("--worlds", nargs="+",
                    default=["world_2", "world_2_cross", "world_3", "world_4",
                             "world_8"])
    pa.add_argument("--steps", type=int, default=200)
    pa.add_argument("--seed", type=int, default=7)
    pa.add_argument("--x64", action="store_true",
                    help="enable float64 for bit-exact comparison")
    pa.add_argument("--eval_mode", action="store_true",
                    help="env_train=False: the eval-time exp_radius "
                         "collision branch (rvo_inter.py:139-150)")
    pa.add_argument("--noise", action="store_true",
                    help="inject identical control-noise samples into both "
                         "implementations (drone.py:163)")
    pa.set_defaults(fn=cmd_parity)

    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
