"""origami_tpu.batch — the batch runtime and CLI stages.

core      Processor/BatchedProcessor, artifact IO, locking, line service
detect    the nine-stage pipeline (segment ... compose)
utils     stats/evaluate/compare/reset/cleanup/sample/signature/...
annotate  debug overlay renderers
export    line-image and Page-XML exports
remote    remote-corpus runner
"""
