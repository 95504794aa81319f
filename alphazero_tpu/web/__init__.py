from alphazero_tpu.web.server import serve

__all__ = ["serve"]
