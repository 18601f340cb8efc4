"""origami_tpu.tool — ground-truth tooling (annotation DB, export,
harmonization, splitting, clustering, migration)."""
