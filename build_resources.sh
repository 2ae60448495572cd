#!/usr/bin/env bash
# Fetch the reference checkpoints from HuggingFace Hub and convert them to
# ARTalk-TPU parameter archives (equivalent of the reference's
# build_resources.sh:1-35 plus the one-time .pt -> npz conversion).
#
# FLAME is license-gated: by downloading you accept the FLAME license
# (https://flame.is.tue.mpg.de/modellicense.html), same gate as the reference.
set -euo pipefail

REPO="https://huggingface.co/xg-chu/ARTalk/resolve/main"
mkdir -p assets/style_motion assets/GAGAvatar

echo "This script downloads FLAME-derived assets."
echo "By continuing you accept the FLAME license (flame.is.tue.mpg.de)."
read -r -p "Continue? [y/N] " ok
[ "${ok}" = "y" ] || exit 1

fetch() {  # fetch <relpath>
    [ -f "assets/$1" ] || wget -q --show-progress -O "assets/$1" "${REPO}/assets/$1"
}

fetch ARTalk_wav2vec.pt
fetch config.json
fetch FLAME_with_eye.pt
fetch GAGAvatar/GAGAvatar.pt
fetch GAGAvatar/tracked.pt
for style in natural_0 natural_1 natural_2 natural_3 happy_0 happy_1 happy_2 \
             curious_0 serious_0 excited_0; do
    fetch "style_motion/${style}.pt" || true
done

echo "Converting to ARTalk-TPU archives..."
python tools/convert_checkpoint.py artalk  assets/ARTalk_wav2vec.pt      assets/artalk_params.npz
python tools/convert_checkpoint.py flame   assets/FLAME_with_eye.pt      assets/flame.npz
python tools/convert_checkpoint.py gaga    assets/GAGAvatar/GAGAvatar.pt assets/gagavatar_params.npz
python tools/convert_checkpoint.py tracked assets/GAGAvatar/tracked.pt   assets/avatars/
python tools/convert_checkpoint.py style   assets/style_motion/          assets/style_motion/
echo "Done."
