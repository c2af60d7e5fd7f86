"""resuneta_tpu — a TPU-native (JAX/Flax/pjit/Pallas) multitask semantic-segmentation
framework with the capabilities of the ResUnet-a multitask Keras pipeline
(reference: thimabru1010/ResUnet-a_mltsk_keras).

Layering (bottom-up):
  ops      — pure-JAX image/label ops (boundary, distance transform, HSV, normalization,
             augmentation, patch extraction) + Pallas kernels for the hot paths
  models   — Flax ResUnet-a d6 (multi-dilation residual blocks, PSPPooling, 4 task heads)
             and the UNet baseline
  losses   — Tanimoto dual, weighted CE, CE/BCE/MSE with Keras-compatible reductions
  metrics  — on-device confusion matrix, accuracy/F1/recall/precision, MCC
  data     — packed-array dataset + on-device label generation pipeline
             (replaces the reference's file-per-patch np.load input pipeline)
  train    — jitted multitask train step, early stopping, checkpointing, TensorBoard
  infer    — sliding-window whole-scene inference + reconstruction
  parallel — device mesh / GSPMD sharding (replaces tf.distribute.MirroredStrategy)
  cli      — entry points preserving the reference CLI argument contracts
"""

__version__ = "0.1.0"
