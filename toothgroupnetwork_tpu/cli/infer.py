"""Inference CLI (reference start_inference.py:9-39 contract): walk a dir of scans,
run the pipeline, write one challenge JSON per scan."""

import argparse
import os
from glob import glob

from ..pipelines import ScanSegmentation, make_inference_pipeline


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run inference to challenge JSON")
    parser.add_argument("--input_dir_path", required=True,
                        help="dir (or dir of dirs) containing .obj scans")
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--checkpoint_path_bdl", default=None,
                        help="second-stage checkpoint (tgnet only)")
    parser.add_argument("--config_path", default=None,
                        help="TrainConfig json the checkpoint was trained with "
                             "(defaults to the model preset)")
    args = parser.parse_args(argv)

    config = None
    if args.config_path:
        from ..train.config import TrainConfig

        config = TrainConfig.load_json(args.config_path)

    ckpts = [args.checkpoint_path]
    if args.checkpoint_path_bdl:
        ckpts.append(args.checkpoint_path_bdl)
    pipeline = make_inference_pipeline(args.model_name, ckpts, config)
    pred_obj = ScanSegmentation(pipeline)

    stl_paths = sorted(glob(os.path.join(args.input_dir_path, "**", "*.obj"),
                            recursive=True))
    os.makedirs(args.save_path, exist_ok=True)
    for i, stl_path in enumerate(stl_paths):
        base = os.path.basename(stl_path).replace(".obj", ".json")
        out = os.path.join(args.save_path, base)
        print(f"[{i + 1}/{len(stl_paths)}] {stl_path} -> {out}")
        pred_obj.process(stl_path, out)


if __name__ == "__main__":
    main()
