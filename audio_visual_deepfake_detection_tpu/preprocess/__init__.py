from .wav import extract_wav, extract_wav_batch, load_wav  # noqa: F401
from .video_io import read_video_frames  # noqa: F401
