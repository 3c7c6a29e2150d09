from .sigmf import decode_sigmf, decode_sigmf_meta, SigmfError  # noqa: F401
