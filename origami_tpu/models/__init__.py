"""origami_tpu.models — Flax model zoo.

unet        U-Net page segmentation (region + separator nets, ensembles)
recognizer  CNN+BiLSTM+CTC line text recognizer
ctc         CTC loss, greedy device decode, host beam search
registry    on-disk model directories (meta.json + params.msgpack)
"""

from . import unet, recognizer, ctc, registry

__all__ = ["unet", "recognizer", "ctc", "registry"]
