"""viddet_tpu — a TPU-native video object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`HaydenFaulkner/VidDet` (training, evaluation and streaming inference of
YOLOv3 / SSD / Faster R-CNN detectors on VOC, COCO, ImageNet-DET and
ImageNet-VID, including temporal multi-frame clip models) — designed
TPU-first rather than translated from the reference's MXNet/GluonCV stack.

Layout (see SURVEY.md §8):
  core/      precision policy, RNG helpers
  parallel/  device mesh construction + sharding helpers (DP over ICI)
  ops/       box math, class-aware NMS (jnp reference + Pallas kernel)
  models/    Darknet-53/tiny backbones, YOLOv3 heads w/ in-graph decode+NMS,
             SSD, Faster R-CNN, temporal multi-frame variants
  data/      VOC/COCO/DET/VID parsers, transforms, prefetching loader
  train/     losses, in-step target assignment, jitted train step, TrainState
  eval/      VOC mAP, in-repo COCOeval (bbox), VID motion-IoU protocol
  infer/     streaming frame-pipeline inference, drawing
  cli/       argparse entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
