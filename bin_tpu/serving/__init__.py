from bin_tpu.serving.server import FrameServer, serve_main  # noqa: F401
