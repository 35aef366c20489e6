from .e2e import (MediaItem, MediaPipeline, discover_media,
                  run_media_pipeline, synth_wav)

__all__ = ["MediaItem", "MediaPipeline", "discover_media",
           "run_media_pipeline", "synth_wav"]
