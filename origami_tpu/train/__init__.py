"""origami_tpu.train — training: GT generation, trainers, checkpoints.

segment   tile datasets, warp augmentation, U-Net trainer, distillation
ocr       CTC recognizer trainer
checkpoint  orbax train-state persistence
"""
