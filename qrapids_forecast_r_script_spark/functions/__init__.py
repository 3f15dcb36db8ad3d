from .scrub import clean_key, clean_key_col, artifact_key, artifact_key_col

__all__ = ["clean_key", "clean_key_col", "artifact_key", "artifact_key_col"]
