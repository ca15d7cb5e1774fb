#!/usr/bin/env python3
"""Offline sample generation from a trained VQ-VAE-2 + hierarchical prior.

Rebuild of the reference generate_samples_pixelcnn_vqvae2.py
(/root/reference/generate_samples_pixelcnn_vqvae2.py:1-188): the hierarchical
twin of generate_samples_pixelcnn_vqvae.py — samples z_top then
z_bottom | z_top and decodes through both codebooks
(sample_with_vqvae2 equivalent).
"""

from generate_samples_pixelcnn_vqvae import main

if __name__ == "__main__":
    main()
