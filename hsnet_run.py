"""HSNet few-shot baseline — train/test driver, the equivalent of the
reference's fewshot_data/train.py + test.py (reference:
fewshot_data/train.py:15-46, test.py:16-46): Adam 1e-3 on the HPN
learner with a frozen torchvision backbone, CE objective, mIoU/FB-IoU
via the episodic AverageMeter.

    python hsnet_run.py test --dataset pascal --fold 0 --nshot 1 \
        --datapath datasets --splits_dir .../splits \
        --backbone_weights resnet101.pth
    python hsnet_run.py train --dataset pascal --fold 0 ...
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser("hsnet")
    p.add_argument("mode", choices=["train", "test"])
    p.add_argument("--dataset", default="pascal",
                   choices=["pascal", "coco", "fss"])
    p.add_argument("--datapath", default="datasets")
    p.add_argument("--splits_dir",
                   default="/root/reference/fewshot_data/data/splits")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=1)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--niter", type=int, default=2000)
    p.add_argument("--img_size", type=int, default=400)
    p.add_argument("--backbone_weights", default=None,
                   help="torchvision resnet101 .pth")
    p.add_argument("--layers", type=int, nargs=4, default=[3, 4, 23, 3])
    p.add_argument("--visualize", action="store_true",
                   help="save support/pred/gt composites per episode "
                        "(reference fewshot_data/common/vis.py)")
    p.add_argument("--vis_path", default="vis")
    p.add_argument("--use_original_imgsize", action="store_true",
                   help="evaluate at each episode's original query size "
                        "(reference test.py:63, hsnet.py:55-75); "
                        "forces bsz=1 (per-episode mask shapes)")
    args = p.parse_args()
    if args.use_original_imgsize:
        args.bsz = 1
    return args


def build(args):
    from lseg_tpu.config import ResNetConfig
    from lseg_tpu.models.hsnet import HSNet
    from lseg_tpu.utils.checkpoint_convert import (
        convert_torchvision_resnet, extract_state_dict, load_torch_file,
    )

    model = HSNet(resnet=ResNetConfig(layers=tuple(args.layers)),
                  dtype=jnp.bfloat16,
                  use_original_imgsize=getattr(
                      args, "use_original_imgsize", False))
    z = jnp.zeros((1, args.img_size, args.img_size, 3))
    m = jnp.zeros((1, args.img_size, args.img_size), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z, z, m)
    if args.backbone_weights:
        sd = extract_state_dict(load_torch_file(args.backbone_weights))
        p, s = convert_torchvision_resnet(sd, tuple(args.layers))
        variables = dict(variables)
        variables["params"] = dict(variables["params"], backbone=p)
        variables["batch_stats"] = {"backbone": s}
    return model, variables


def episodes(args, split):
    from lseg_tpu.data.fewshot import build_fewshot_dataset

    return build_fewshot_dataset(
        args.dataset, args.datapath, args.fold, split,
        max(args.nshot, 1), splits_dir=args.splits_dir,
        img_size=args.img_size, imagenet_norm=True,
        use_original_imgsize=getattr(args, "use_original_imgsize", False),
    )


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    from lseg_tpu.models.hsnet import predict_mask_nshot
    from lseg_tpu.ops.losses import cross_entropy
    from lseg_tpu.ops.metrics import AverageMeter, episode_inter_union

    model, variables = build(args)
    ds = episodes(args, "test" if args.mode == "test" else "trn")

    def stack(idxs):
        eps = [ds[i] for i in idxs]
        return {
            k: jnp.asarray(np.stack([e[k] for e in eps]))
            for k in ("query_img", "query_mask", "query_ignore",
                      "support_imgs", "support_masks")
        }, np.asarray([e["class_id"] for e in eps])

    if args.mode == "test":
        @jax.jit
        def apply_fn(q, s, m):
            return model.apply(variables, q, s, m)

        vis = None
        if args.visualize and args.use_original_imgsize:
            raise SystemExit(
                "--visualize needs network-size masks; drop "
                "--use_original_imgsize (the reference Visualizer has "
                "the same constraint)")
        if args.visualize:
            from lseg_tpu.utils.fewshot_vis import EpisodeVisualizer

            vis = EpisodeVisualizer(
                args.vis_path,
                mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
            )
        meter = AverageMeter(ds.class_ids)
        # original-imgsize mode: per-episode mask shapes vary, so the
        # metric runs unjitted (bsz=1) — only the model forward stays a
        # single static program
        iu = (episode_inter_union if args.use_original_imgsize
              else jax.jit(episode_inter_union))
        n = len(ds)
        for start in range(0, n, args.bsz):
            idxs = list(range(start, min(start + args.bsz, n)))
            batch, cids = stack(idxs)
            org = (batch["query_mask"].shape[1:3]
                   if args.use_original_imgsize else None)
            pred = predict_mask_nshot(apply_fn, batch, args.nshot,
                                      org_size=org)
            inter, union = iu(
                pred, batch["query_mask"], batch["query_ignore"]
            )
            meter.update(np.asarray(inter), np.asarray(union), cids)
            if vis is not None:
                it, un = np.asarray(inter), np.asarray(union)
                vis.batch(batch, np.asarray(pred), list(cids),
                          start // args.bsz,
                          ious=it[:, 1] / np.maximum(un[:, 1], 1e-7))
            if (start // args.bsz) % 20 == 0:
                miou, fb = meter.compute_iou()
                print(f"[{start + len(idxs)}/{n}] mIoU {miou:.2f} "
                      f"FB-IoU {fb:.2f}", flush=True)
        miou, fb = meter.compute_iou()
        print(f"FINAL {args.dataset} fold{args.fold} {args.nshot}-shot "
              f"mIoU {miou:.2f} FB-IoU {fb:.2f}")
        return

    # train: Adam on the learner, frozen backbone (hsnet.py:104-106 +
    # train.py:23-24 semantics)
    tx = optax.multi_transform(
        {"frozen": optax.set_to_zero(), "learner": optax.adam(args.lr)},
        lambda params: {
            k: jax.tree_util.tree_map(
                lambda _: "frozen" if k == "backbone" else "learner", v
            )
            for k, v in params.items()
        },
    )
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            logits = model.apply(
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                batch["query_img"], batch["support_imgs"][:, 0],
                batch["support_masks"][:, 0],
            )
            return cross_entropy(logits, batch["query_mask"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    params = variables["params"]
    rng = np.random.RandomState(0)
    for it in range(args.niter):
        idxs = rng.randint(0, len(ds), args.bsz)
        batch, _ = stack(list(idxs))
        params, opt_state, loss = train_step(params, opt_state, batch)
        if it % 50 == 0:
            print(f"iter {it} loss {float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
