"""Command-line entry points: train, evaluate, infer, artistic, uv_texture.

Equivalents of the reference's runtime scripts (main_train.py,
benchmark.py, singleImage.py, artistic.py, uv_texture_realFaces.py), all
built on one Config tree and the shared pipeline/eval subsystems. Run as
``python -m synergynet_tpu.cli.<name>``.
"""
