"""Multimodal (image/audio/video) column support — binary payloads with
typed metadata; Spark-side plumbing is real, codec decode is stubbed."""
