"""origami_tpu.parallel — meshes, shardings, multi-host assignment,
compilation cache."""
