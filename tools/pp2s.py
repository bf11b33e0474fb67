"""PP2S offline preprocessing CLI (reference: the my_*_final.py scripts,
SURVEY.md §3.5). Runs one stage or all of them."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AO_PLATFORM"):
    # the axon plugin force-sets jax_platforms at interpreter start; the
    # env var alone does not stick — override through jax.config (lets
    # the offline stages run on CPU while the chip trains)
    import jax

    jax.config.update("jax_platforms", os.environ["AO_PLATFORM"])

from ao_tpu.pp2s import PP2SPipeline  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data")
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--sam-model-type", default="vit_h",
                   choices=["vit_h", "vit_l", "vit_b", "tiny"])
    p.add_argument(
        "--stage", default="all",
        choices=["render_frames", "embeddings", "bridges", "weak_labels",
                 "basket", "sam_labels", "all"],
    )
    p.add_argument("--areas", nargs="+", default=None)
    p.add_argument(
        "--frame-size", type=int, default=1080,
        help="frame pixel size for SAM prompt mapping (512 for the "
        "render_frames variant's synthetic views)",
    )
    p.add_argument(
        "--sam-oracle", action="store_true",
        help="no-checkpoint mode: stage 1 rasterises GT instance-id maps "
        "and stage 5 decodes oracle masks from them (models/sam/oracle.py)",
    )
    p.add_argument("--oracle-quality", type=float, default=0.7)
    p.add_argument(
        "--render-views", type=int, default=6,
        help="horizontal viewpoints for the render_frames stage (two "
        "vertical views are always added); more views = more cross-frame "
        "vote evidence for the conflict-drop",
    )
    p.add_argument(
        "--bridge-depth-thresh", type=float, default=0.1,
        help="visibility depth test (reference 0.1 m; 0.02 for the "
        "synthetic proxy whose splat depth is exact — see pipeline)",
    )
    args = p.parse_args()
    pipe = PP2SPipeline(
        data_root=args.data_root,
        sam_checkpoint=args.sam_checkpoint,
        sam_model_type=args.sam_model_type,
        areas=tuple(args.areas) if args.areas else
        ("Area_1", "Area_2", "Area_3", "Area_4", "Area_6"),
        sam_oracle=args.sam_oracle,
        oracle_quality=args.oracle_quality,
        bridge_depth_thresh=args.bridge_depth_thresh,
    )
    fs = (args.frame_size, args.frame_size)
    if args.stage == "all":
        pipe.run_all(frame_size=fs)
    elif args.stage == "sam_labels":
        pipe.run_sam_labels(frame_size=fs)
    elif args.stage == "render_frames":
        pipe.run_render_frames(views=args.render_views,
                               size=args.frame_size)
    else:
        getattr(pipe, f"run_{args.stage}")()


if __name__ == "__main__":
    main()
