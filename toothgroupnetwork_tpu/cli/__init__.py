"""Command-line entry points (the reference's start_train.py / start_inference.py /
preprocess_data.py / split_txt_maker.py / eval_visualize_results.py equivalents).

Usage: ``python -m toothgroupnetwork_tpu.cli.<preprocess|train|infer|evaluate|split>``.
"""
