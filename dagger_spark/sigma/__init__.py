from .compiler import SigmaCompileError, compile_sigma, compile_sigma_file, compile_sigma_dir

__all__ = ["SigmaCompileError", "compile_sigma", "compile_sigma_file", "compile_sigma_dir"]
