from bin_tpu.serving.client import StreamClient  # noqa: F401
from bin_tpu.serving.server import FrameServer, serve_main  # noqa: F401
