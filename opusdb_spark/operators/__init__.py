"""Custom operators Spark lacks natively, built as DataFrame compositions
(asof, sessionize, dedup, similarity, text, multimodal)."""
