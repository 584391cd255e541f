"""Offline preprocessing CLI (reference preprocess_data.py:7-11 arg contract)."""

import argparse

from ..data.preprocess import preprocess_dir


def main(argv=None):
    parser = argparse.ArgumentParser(description="Preprocess dental scans to 24k-point npy")
    parser.add_argument("--source_obj_data_path", required=True,
                        help="dir of per-patient subdirs containing .obj scans")
    parser.add_argument("--source_json_data_path", required=True,
                        help="dir of per-patient subdirs containing label .json files")
    parser.add_argument("--save_data_path", default="data_preprocessed_path")
    args = parser.parse_args(argv)
    n = preprocess_dir(args.source_obj_data_path, args.source_json_data_path,
                       args.save_data_path)
    print(f"preprocessed {n} scans -> {args.save_data_path}")


if __name__ == "__main__":
    main()
