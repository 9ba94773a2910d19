from video_caption_tpu.data.data_loader import MSVDDataset, build_dataloader  # noqa: F401
