from raykg.cli import entrypoint

entrypoint()
