from audioldm_tpu.models import clap_audio, clap_text, nn, scheduler, unet, vae, vocoder  # noqa: F401
