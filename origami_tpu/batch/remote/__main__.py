"""python -m origami_tpu.batch.remote — remote corpus runner CLI."""

from origami_tpu.batch.remote.runner import remote

if __name__ == "__main__":
    remote()
