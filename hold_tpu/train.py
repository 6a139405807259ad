"""Training entry point: python -m hold_tpu.train --case <seq> [flags].

CLI-surface parity with the reference's code/train.py (same flags via
utils.config.build_argparser), re-architected as an explicit JAX train loop:
one jitted SPMD train step (rays sharded over the device mesh, gradients
psum'd by GSPMD), optax Adam with the reference's two LR groups (pose tables
at 0.1x lr: code/src/hold/hold.py:79-101), orbax checkpoints, canonical
meshing between epochs via the native MISE extractor.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data.dataset import SequenceData
from .meshing.cano import mesh_all_cano
from .models.holdnet import (
    build_scene,
    empty_object_mesh_state,
    holdnet_forward,
    init_scene_params,
    object_mesh_state_from_mesh,
)
from .models.losses import compute_losses
from .parallel.sharding import make_mesh, shard_batch
from .utils.checkpoint import save_checkpoint, save_misc, to_host
from .utils.config import parse_args
from .utils.logger import StepTimer, Tracker
from .utils.metrics import psnr


def optimizer_for(args, params, proposal_lr: float = 1e-3):
    """Adam with pose tables at 0.1x lr (frozen if --freeze_pose); the object
    scale stays a non-trained buffer during scene training; the sampler
    proposal nets get their own (faster) Adam — they chase the trunk."""

    def label_fn(tree):
        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v, path + (i,)) for i, v in enumerate(node)]
            if "proposal" in path:
                return "proposal"
            if "tables" in path:
                return "frozen" if args.freeze_pose else "pose"
            if path and path[-1] == "obj_scale":
                return "frozen"
            return "main"

        return walk(tree, ())

    lr = args.lr
    tx = optax.multi_transform(
        {
            "main": optax.adam(lr, eps=1e-8),
            "pose": optax.adam(lr * 0.1, eps=1e-8),
            "proposal": optax.adam(proposal_lr, eps=1e-8),
            "frozen": optax.set_to_zero(),
        },
        label_fn(params),
    )
    return tx


def make_train_step(scene, tx):
    """Two jitted stages: the (stop-gradient) error-bound sampler and the
    render+loss+grad step — compiled separately because the fused graph
    crashes the TPU compiler's fusion pass at production sizes.

    The sampler stage compiles twice when the proposal net is enabled: an
    exact-trunk variant (warmup, while the surrogate distills) and the
    proposal variant used afterwards.  The switch is a host-side decision on
    the integer step, so neither graph retraces."""
    from .models.holdnet import sample_all_z

    sample_fns = {
        mode: jax.jit(
            lambda params, batch, key, step, epoch, _m=mode: sample_all_z(
                params, scene, batch, key, step, epoch, training=True,
                proposal_mode=_m,
            )
        )
        for mode in (False, True)
    }
    prop_cfg = scene.opt_model.get("proposal", {})
    prop_on = any(
        scene.plans[nid].proposal is not None for nid in scene.node_ids
    )
    warmup = int(prop_cfg.get("warmup", 1000))

    def sample_fn(params, batch, key, step, epoch, *, host_step=None):
        use_prop = bool(
            prop_on and host_step is not None and host_step >= warmup
        )
        return sample_fns[use_prop](params, batch, key, step, epoch)

    def step_fn(params, opt_state, batch, mesh_state, z_vals, key, step, epoch):
        def loss_fn(p):
            out = holdnet_forward(
                p, scene, batch, mesh_state, key, step, epoch, training=True,
                z_vals_dict=z_vals,
            )
            losses = compute_losses(batch, out, scene.node_ids, step)
            aux = dict(losses)
            aux["psnr"] = psnr(out["rgb"], batch["gt_rgb"])
            return losses["loss"], aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    grad_fn = jax.jit(step_fn, donate_argnums=(0, 1))

    def train_step(params, opt_state, batch, mesh_state, key, step, epoch,
                   host_step=None):
        k_sample, k_loss = jax.random.split(key)
        z_vals = sample_fn(params, batch, k_sample, step, epoch,
                           host_step=host_step)
        return grad_fn(
            params, opt_state, batch, mesh_state, z_vals, k_loss, step, epoch
        )

    return train_step


def run_training(args, cfg, seq: SequenceData | None = None,
                 max_steps: int | None = None):
    """Programmatic entry (also used by tests/bench)."""
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # on-device RNG: threefry bit generation traced at ~6.6ms/step of the
    # train step (4 fused u32 generators for the loss-target draws); the
    # hardware rbg generator is effectively free.  Training noise does not
    # need counter-based reproducibility across backends.
    jax.config.update("jax_default_prng_impl", "rbg")
    if seq is None:
        seq = SequenceData(args.case, args.data_root, num_sample=args.num_sample)
    opt_model = dict(cfg["model"])
    opt_model["scene_bounding_sphere"] = seq.scene_bounding_sphere
    if args.fast_dev_run:
        opt_model["ray_sampler"] = dict(
            opt_model["ray_sampler"],
            N_samples=16, N_samples_eval=32, N_samples_extra=8,
            max_total_iters=2,
        )

    scene = build_scene(opt_model, dict(args), seq.scene_data())
    rng = jax.random.PRNGKey(int(args.get("seed", 0)))
    params = init_scene_params(rng, scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()

    tracker = Tracker(args.log_root, args.exp_key, args=args, mute=args.mute)
    log = tracker.logger
    args.exp_key = tracker.exp_key
    log.info(f"experiment {tracker.exp_key}: case={args.case} "
             f"nodes={scene.node_ids} frames={seq.n_frames}")

    tx = optimizer_for(
        args, params,
        proposal_lr=float(opt_model.get("proposal", {}).get("lr", 1e-3)),
    )
    opt_state = tx.init(params)
    train_step = make_train_step(scene, tx)

    start_step = 0
    if args.load_ckpt:
        from .utils.checkpoint import load_checkpoint

        state = load_checkpoint(args.load_ckpt, {"params": params, "step": 0})
        params = state["params"]
        log.info(f"loaded weights from {args.load_ckpt}")
    else:
        # auto-resume from this experiment's last checkpoint, the way the
        # reference resumes via the exp-key folder (comet_utils.py:20-28 +
        # train.py:52,75); optimizer state restores too when present
        from .utils.checkpoint import latest_checkpoint, load_checkpoint

        last = latest_checkpoint(tracker.log_dir)
        if last:
            try:
                state = load_checkpoint(
                    last, {"params": params, "opt_state": opt_state, "step": 0}
                )
                opt_state = state["opt_state"]
            except Exception:
                # older checkpoint without optimizer state
                state = load_checkpoint(last, {"params": params, "step": 0})
            params = state["params"]
            start_step = int(state["step"])
            log.info(f"resuming from {last} at step {start_step}")
    if args.load_pose and start_step == 0:
        from .utils.checkpoint import load_params_subset

        params = load_params_subset(
            args.load_pose, params,
            lambda path: "tables" in path or path[-1:] == ("obj_scale",),
        )
        log.info(f"loaded pose tables from {args.load_pose}")
    elif args.load_pose:
        # resumed run: the resumed tables already incorporate (and have
        # trained past) the pose init — re-applying it would clobber
        # start_step steps of pose recovery
        log.info(f"resume at step {start_step}: NOT re-applying --load_pose")
    if args.get("shape_init"):
        # hand canonical-SDF warm start from a pretrained experiment
        # (hold_net.py:136-152 role: implicit networks only, background and
        # object excluded)
        from .utils.checkpoint import latest_checkpoint, load_params_subset

        src = latest_checkpoint(os.path.join(args.log_root, args.shape_init))
        if src:
            params = load_params_subset(
                src, params,
                lambda path: len(path) >= 2
                and path[0] in ("right", "left")
                and path[1] == "implicit",
            )
            log.info(f"hand shape init from {src}")
        else:
            log.warning(f"--shape_init {args.shape_init}: no checkpoint found")

    dev_mesh = make_mesh(int(args.get("num_devices", 0)))
    # commit params/opt state to the mesh up front: otherwise the first step
    # runs with uncommitted single-device inputs, returns mesh-committed
    # outputs, and step 1 silently recompiles
    from .parallel.sharding import replicated

    params = jax.device_put(params, replicated(dev_mesh))
    opt_state = jax.device_put(opt_state, replicated(dev_mesh))
    mesh_state = jax.device_put(mesh_state, replicated(dev_mesh))
    batch_size = cfg["dataset"]["train"]["batch_size"]
    steps_per_epoch = max(args.tempo_len // batch_size, 1)
    total_steps = max_steps or args.total_step
    np_rng = np.random.RandomState(int(args.get("seed", 0)))
    key = jax.random.PRNGKey(1234)

    timer = StepTimer()
    val_chunk_fn = None  # built lazily, reused across validations

    # -- asynchronous canonical meshing -------------------------------------
    # mesh_all_cano is mostly host work (MISE octree + marching tetrahedra in
    # C++) plus small jitted SDF grid queries; running it on a worker thread
    # overlaps it with training instead of stalling the step loop ~10s every
    # 3 epochs.  The fresh object mesh_state swaps in at the next step
    # boundary after the thread finishes (same cadence role as
    # hold.py:139-149, minus the stall).  fast_dev_run stays synchronous so
    # smoke tests see mesh artifacts the moment run_training returns.
    from concurrent.futures import ThreadPoolExecutor

    mesher = ThreadPoolExecutor(max_workers=1)
    mesh_future = None
    pending_mesh_snapshot = None
    sync_meshing = bool(args.fast_dev_run)

    def run_meshing(host_params, at_step):
        res_scale = 4 if args.fast_dev_run else 1
        meshes = mesh_all_cano(host_params, scene, res_scale=res_scale)
        for nid, m in meshes.items():
            out_p = os.path.join(
                tracker.log_dir, "mesh_cano",
                f"mesh_cano_{nid}_step_{at_step}.obj",
            )
            os.makedirs(os.path.dirname(out_p), exist_ok=True)
            m.export(out_p)
            log.info(f"exported canonical mesh {out_p} "
                     f"({m.vertices.shape[0]} verts)")
        misc = {
            "K": seq.intrinsics_all[0],
            "w2c": np.linalg.inv(seq.extrinsics_all[0]),
            "scale": seq.scale,
            "img_paths": seq.img_paths,
            "object.obj_scale": float(
                np.asarray(host_params["object"]["obj_scale"])
            ) if "object" in host_params else 1.0,
            "meshes_cano": {
                nid: {"vertices": m.vertices, "faces": m.faces}
                for nid, m in meshes.items()
            },
        }
        save_misc(tracker.log_dir, at_step, misc)
        return meshes

    def adopt_meshes(meshes):
        if "object" in meshes:
            return jax.device_put(
                object_mesh_state_from_mesh(
                    meshes["object"].vertices, meshes["object"].faces
                ),
                replicated(dev_mesh),
            )
        return None

    # host-side prefetch: the numpy pixel sampler runs one step ahead on a
    # worker thread so the device never waits on host data (double buffering;
    # the async dispatch of the previous device step overlaps the next
    # sample).  np_rng is owned by the prefetch thread; validation uses its
    # own rng stream so frame picks don't race the sampler.
    data_pool = ThreadPoolExecutor(max_workers=1)
    val_rng = np.random.RandomState(int(args.get("seed", 0)) + 7919)

    def sample_next():
        return seq.sample_tempo_batch(
            np_rng, batch_size, offset=args.offset, num_sample=args.num_sample
        )

    next_batch = data_pool.submit(sample_next)

    t_start = time.time()
    t_window = time.time()
    step = start_step
    while step < total_steps:
        epoch = step // steps_per_epoch
        timer.start("data")
        batch_np = next_batch.result()
        next_batch = data_pool.submit(sample_next)
        with dev_mesh:
            batch = shard_batch(batch_np, dev_mesh)
        timer.stop("data")

        timer.start("step")
        key, sub = jax.random.split(key)
        params, opt_state, aux = train_step(
            params, opt_state, batch, mesh_state, sub,
            jnp.asarray(step), jnp.asarray(epoch), host_step=step,
        )
        if step % args.log_every == 0:
            aux = {k: float(v) for k, v in aux.items()}
            timer.stop("step")
            tracker.log_dict(aux, step=step, epoch=epoch)
            rays = batch_np["uv"].shape[0] * batch_np["uv"].shape[1]
            # window throughput: steps run async, so per-step wall time is
            # only meaningful averaged between sync points
            window = max(time.time() - t_window, 1e-9)
            n_window = args.log_every if step > 0 else 1
            t_window = time.time()
            log.info(
                f"step {step} epoch {epoch} loss {aux['loss']:.4f} "
                f"psnr {aux['psnr']:.2f} "
                f"({rays * n_window / window:.0f} rays/s)"
            )
        else:
            timer.stop("step")

        step += 1
        # collect a finished background meshing run: swap in the new object
        # mesh state at this step boundary
        if mesh_future is not None and mesh_future.done():
            timer.start("meshing")
            try:
                ms = adopt_meshes(mesh_future.result())
                if ms is not None:
                    mesh_state = ms
            except Exception as e:  # meshing must never kill training
                log.warning(f"async meshing failed: {e}")
            mesh_future = None
            if pending_mesh_snapshot is not None:
                mesh_future = mesher.submit(run_meshing, *pending_mesh_snapshot)
                pending_mesh_snapshot = None
            timer.stop("meshing")

        # epoch boundary: meshing + checkpoints (hold.py:139-166 cadence)
        if step % steps_per_epoch == 0:
            ep = step // steps_per_epoch
            if (ep % 3 == 0 and not args.no_meshing) or (
                args.fast_dev_run and not args.no_meshing
            ):
                timer.start("meshing")
                host_params = to_host(params)  # sync snapshot, ~ms
                if sync_meshing:
                    try:
                        ms = adopt_meshes(run_meshing(host_params, step))
                        if ms is not None:
                            mesh_state = ms
                    except Exception as e:
                        log.warning(f"meshing failed: {e}")
                elif mesh_future is None:
                    mesh_future = mesher.submit(run_meshing, host_params, step)
                    pending_mesh_snapshot = None
                else:
                    # queue the latest snapshot so at most one cadence is
                    # coalesced (never silently dropped) when meshing
                    # outlasts an epoch
                    pending_mesh_snapshot = (host_params, step)
                    log.warning(
                        "meshing still running at epoch %d; queued snapshot "
                        "for step %d (coalescing previous pending one)",
                        ep, step,
                    )
                timer.stop("meshing")
            if ep % max(args.eval_every_epoch, 1) == 0 or step >= total_steps:
                save_checkpoint(
                    tracker.log_dir, step,
                    {"params": to_host(params),
                     "opt_state": to_host(opt_state), "step": step},
                )
                log.info(f"checkpoint at step {step}")
                if not args.get("no_vis", False):
                    # validation render of one random frame
                    # (hold.py:169-208 + validation_epoch_end role)
                    timer.start("val_render")
                    try:
                        from .render.renderer import (
                            make_chunk_renderer,
                            outputs_to_panel,
                            render_frame,
                        )

                        if val_chunk_fn is None:
                            val_chunk_fn = make_chunk_renderer(
                                scene, mesh_state, mesh=dev_mesh
                            )
                        vidx = int(val_rng.randint(seq.n_frames))
                        fb = seq.full_frame_batch(
                            vidx, downsample=args.render_downsample
                        )
                        res = render_frame(params, scene, mesh_state, fb,
                                           pixel_per_batch=4096,
                                           chunk_fn=val_chunk_fn,
                                           mesh=dev_mesh)
                        gt = fb["gt_rgb"].reshape(*fb["img_hw"], 3)
                        mse = float(np.mean((res["rgb"] - gt) ** 2))
                        val_psnr = -10.0 * np.log10(max(mse, 1e-12))
                        tracker.log_dict(
                            {"val/psnr": val_psnr}, step=step, epoch=ep
                        )
                        tracker.log_image(
                            f"val_{vidx:04d}",
                            outputs_to_panel(res, gt_rgb=gt), step,
                        )
                        log.info(
                            f"val render frame {vidx}: psnr {val_psnr:.2f}"
                        )
                    except Exception as e:  # vis must never kill training
                        log.warning(f"val render failed: {e}")
                    timer.stop("val_render")

    # flush any in-flight meshing so artifacts exist when we return
    if mesh_future is not None:
        try:
            ms = adopt_meshes(mesh_future.result())
            if ms is not None:
                mesh_state = ms
        except Exception as e:
            log.warning(f"async meshing failed: {e}")
    mesher.shutdown(wait=True)
    data_pool.shutdown(wait=False, cancel_futures=True)

    save_checkpoint(
        tracker.log_dir, step,
        {"params": to_host(params), "opt_state": to_host(opt_state),
         "step": step},
    )
    wall = time.time() - t_start
    log.info(f"done: {step} steps in {wall:.1f}s; phases: {timer.summary()}")
    return params, scene, mesh_state, tracker


def main():
    args, cfg = parse_args()
    if args.get("coordinator"):
        from .parallel.sharding import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    run_training(args, cfg)


if __name__ == "__main__":
    main()
