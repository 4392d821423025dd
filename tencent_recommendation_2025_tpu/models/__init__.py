from . import embedding, attention, hstu, encoder, baseline, rqvae  # noqa: F401
