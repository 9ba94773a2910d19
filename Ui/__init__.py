"""Legacy compatibility shim: the reference's module path, forwarding to
video_caption_tpu. Kept so existing commands/imports keep working
(MIGRATION.md maps every entry point)."""
