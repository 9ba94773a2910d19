from video_caption_tpu.preprocessing.frame_loader import list_frames, load_video_array  # noqa: F401
