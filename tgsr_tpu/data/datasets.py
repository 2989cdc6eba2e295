"""Dataset adapters (host side: file discovery + caption indexing + decode).

= datasets.py's nine dataset classes, re-architected for TPU: the host layer
only decodes images and produces (hr_uint8, tokens, len, class_id, key);
the pyramid / bicubic-LR / blur / normalize preprocessing moves on-device
(tgsr_tpu.data.pipeline.device_preprocess), fused under jit, instead of the
reference's per-worker PIL pipelines (datasets.py:112-278).

No sort-by-length collate: the masked-scan text encoder removes the packed-
sequence sorting requirement of prepare_data (datasets.py:33-68).

Format contracts preserved:
  TextDataset       -- text/<name>.txt captions, captions.pickle cache,
                       filenames.pickle splits, class_info.pickle, CUB bbox
                       crop (datasets.py:282-500)
  TextFaceDataset   -- CelebA list_attr_celeba.txt; captions = names of
                       attributes set to 1; train/test split on attribute 11
                       (Blurry) == 0/1 (datasets.py:906-1143)
  TextFlowerDataset -- Oxford-102 text_c10/class_*/ caption dirs, last 3
                       files per class = test (datasets.py:1146-1345)
  TextExampleSRDataset -- filename-list + prebuilt caption pickle eval set
                       (datasets.py:1551-1688)
"""

from __future__ import annotations

import os
import pickle
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from tgsr_tpu.data.tokenizer import (
    Vocab,
    build_dictionary,
    encode_caption,
    tokenize_caption,
)


def _load_image_rgb(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def _load_and_resize(path: str, size: int, enlarge: float,
                     rng=None) -> np.ndarray:
    """Decode + antialiased center-crop-resize, preferring the native C++
    loader (tgsr_tpu/native, libjpeg/libpng + triangle filter; max 1/255
    deviation from PIL) and falling back to PIL. With `rng` (train
    augmentation) the crop is RANDOM and a coin-flip mirrors the image —
    the reference training transform Resize(int(imsize*enlarge)) +
    RandomCrop(imsize) + RandomHorizontalFlip (pretrain_DAMSM.py:237-240,
    test1.py:185-186); that path decodes via PIL (the native fast path
    covers the deterministic eval crop)."""
    if rng is not None:
        return _random_crop_flip(_load_image_rgb(path), size, enlarge, rng)
    try:
        from tgsr_tpu import native

        if native.available():
            return native.load_image(path, size, enlarge)
    except Exception:
        pass
    return _center_crop_resize(_load_image_rgb(path), size, enlarge)


def _resize_short_side(img: np.ndarray, target: int) -> np.ndarray:
    """torchvision Resize(int) semantics: short side -> target, long side
    int(target*long/short) (truncation)."""
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    if w <= h:
        ow, oh = target, max(target, int(target * h / w))
    else:
        ow, oh = max(target, int(target * w / h)), target
    return np.asarray(pil.resize((ow, oh), Image.BILINEAR), np.uint8)


def _random_crop_flip(img: np.ndarray, size: int, enlarge: float,
                      rng) -> np.ndarray:
    """RandomCrop(size) + RandomHorizontalFlip over the short-side-resized
    image (the reference's training transform)."""
    resized = _resize_short_side(img, max(int(size * enlarge), size))
    h, w = resized.shape[:2]
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    crop = resized[top:top + size, left:left + size]
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    return np.ascontiguousarray(crop)


def _center_crop_resize(img: np.ndarray, size: int,
                        enlarge: float = 1.0) -> np.ndarray:
    """Resize shorter side to size*enlarge then center-crop size
    (= transforms.Resize(int(imsize*72/64)) + CenterCrop(imsize),
    datasets.py:1558-1561)."""
    resized = _resize_short_side(img, max(int(size * enlarge), size))
    h, w = resized.shape[:2]
    left = (w - size) // 2
    top = (h - size) // 2
    return np.ascontiguousarray(resized[top:top + size, left:left + size])


def bbox_crop(img: np.ndarray, bbox: Sequence[int]) -> np.ndarray:
    """CUB bounding-box crop: 0.75-padded square around the box
    (= get_imgs, datasets.py:115-123)."""
    h, w = img.shape[:2]
    r = int(np.maximum(bbox[2], bbox[3]) * 0.75)
    cx = int((2 * bbox[0] + bbox[2]) / 2)
    cy = int((2 * bbox[1] + bbox[3]) / 2)
    y1, y2 = max(0, cy - r), min(h, cy + r)
    x1, x2 = max(0, cx - r), min(w, cx + r)
    return img[y1:y2, x1:x2]


@dataclass
class Example:
    hr: np.ndarray  # [H, W, 3] uint8 (full-res, pre-pyramid)
    tokens: np.ndarray  # [T] int
    length: int
    class_id: int
    key: str


class _CaptionDatasetBase:
    """Shared caption/vocab machinery."""

    filenames: List[str]
    captions: List[List[int]]  # encoded; embeddings_num per image
    vocab: Vocab
    class_id: np.ndarray
    embeddings_num: int = 1
    words_num: int = 18
    imsize: int = 256
    # train-split adapters set this True: the reference training transform
    # is Resize + RandomCrop + RandomHorizontalFlip (pretrain_DAMSM.py:
    # 237-240, test1.py:185-186); eval stays deterministic center-crop
    augment: bool = False

    def __len__(self) -> int:
        return len(self.filenames)

    @property
    def n_words(self) -> int:
        return self.vocab.n_words

    def get_caption(self, sent_ix: int,
                    rng: Optional[np.random.Generator] = None):
        return encode_caption(self.captions[sent_ix], self.words_num, rng)

    def _image(self, index: int, rng=None) -> np.ndarray:
        raise NotImplementedError

    def __getitem__(self, index: int,
                    rng: Optional[np.random.Generator] = None,
                    sent_ix: Optional[int] = None) -> Example:
        rng = rng or np.random.default_rng()
        if sent_ix is None:
            # random caption per epoch (datasets.py:494); test protocols use
            # caption 0 deterministically (datasets.py:893-896)
            sent_ix = int(rng.integers(0, self.embeddings_num))
        toks, length = self.get_caption(
            index * self.embeddings_num + sent_ix, rng)
        return Example(
            # augmentation draws ride the caller's rng: BatchLoader's
            # (seed, epoch)-deterministic stream keeps exact resume exact
            hr=self._image(index, rng if self.augment else None),
            tokens=toks.astype(np.int32),
            length=length,
            class_id=int(self.class_id[index]),
            key=self.filenames[index],
        )


class TextDataset(_CaptionDatasetBase):
    """AttnGAN-style dataset (bird/coco): per-image caption .txt files,
    vocabulary cached in captions.pickle (= datasets.py:282-500)."""

    def __init__(self, data_dir: str, split: str = "train",
                 words_num: int = 18, embeddings_num: int = 10,
                 imsize: int = 256, no_stopwords: bool = False,
                 only_color: bool = False,
                 cache_name: str = "captions.pickle"):
        self.data_dir = data_dir
        self.split = split
        self.augment = split == "train"  # reference training transform
        self.words_num = words_num
        self.embeddings_num = embeddings_num
        self.imsize = imsize
        self.no_stopwords = no_stopwords
        self.only_color = only_color
        self.bbox = (self._load_bbox()
                     if data_dir.find("birds") != -1 else None)

        train_names = self._load_filenames(data_dir, "train")
        test_names = self._load_filenames(data_dir, "test")
        cache = os.path.join(data_dir, cache_name)
        if os.path.isfile(cache):
            with open(cache, "rb") as f:
                x = pickle.load(f)
            train_caps, test_caps = x[0], x[1]
            self.vocab = Vocab(x[2], x[3])
        else:
            train_tok = self._load_captions(data_dir, train_names)
            test_tok = self._load_captions(data_dir, test_names)
            train_caps, test_caps, self.vocab = build_dictionary(
                train_tok, test_tok)
            with open(cache, "wb") as f:
                pickle.dump([train_caps, test_caps, self.vocab.ixtoword,
                             self.vocab.wordtoix], f, protocol=2)
        if split == "train":
            self.filenames, self.captions = train_names, train_caps
        else:
            self.filenames, self.captions = test_names, test_caps
        self.class_id = self._load_class_id(
            os.path.join(data_dir, split), len(self.filenames))

    def _load_bbox(self) -> Dict[str, List[int]]:
        """= load_bbox (datasets.py:311-333), plain parsing (no pandas)."""
        boxes, names = [], []
        with open(os.path.join(self.data_dir,
                               "CUB_200_2011/bounding_boxes.txt")) as f:
            for line in f:
                parts = line.split()
                boxes.append([int(float(v)) for v in parts[1:5]])
        with open(os.path.join(self.data_dir, "CUB_200_2011/images.txt")) as f:
            for line in f:
                names.append(line.split()[1])
        return {n[:-4]: b for n, b in zip(names, boxes)}

    def _load_captions(self, data_dir, filenames):
        all_caps = []
        for name in filenames:
            with open(f"{data_dir}/text/{name}.txt", "rb") as f:
                caps = f.read().decode("utf8").split("\n")
            cnt = 0
            for cap in caps:
                if len(cap) == 0:
                    continue
                tokens = tokenize_caption(cap, self.no_stopwords,
                                          self.only_color)
                if not tokens:
                    continue
                all_caps.append(tokens)
                cnt += 1
                if cnt == self.embeddings_num:
                    break
            if cnt < self.embeddings_num:
                # the flat index*embeddings_num addressing is now
                # misaligned for every later image — surface it at the
                # cause (reference diagnostic incl. its %-cnt quirk,
                # datasets.py:364-366)
                print("ERROR: the captions for %s less than %d"
                      % (name, cnt))
        return all_caps

    @staticmethod
    def _load_filenames(data_dir, split):
        path = f"{data_dir}/{split}/filenames.pickle"
        if os.path.isfile(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        return []

    @staticmethod
    def _load_class_id(split_dir, total):
        path = os.path.join(split_dir, "class_info.pickle")
        if os.path.isfile(path):
            with open(path, "rb") as f:
                return np.asarray(pickle.load(f, encoding="iso-8859-1"))
        return np.arange(total)

    def _image(self, index, rng=None):
        key = self.filenames[index]
        if self.bbox is not None:
            img = _load_image_rgb(
                f"{self.data_dir}/CUB_200_2011/images/{key}.jpg")
            img = bbox_crop(img, self.bbox[key])
        else:
            img = _load_image_rgb(f"{self.data_dir}/images/{key}.jpg")
        if rng is not None:
            return _random_crop_flip(img, self.imsize, 76 / 64, rng)
        return _center_crop_resize(img, self.imsize, enlarge=76 / 64)


class TextFaceDataset(_CaptionDatasetBase):
    """CelebA attribute-caption dataset (= datasets.py:906-1143).

    Captions = names of attributes set to 1 in list_attr_celeba.txt;
    train/test split on attribute 11 (Blurry) == 0/1.
    """

    embeddings_num = 1

    def __init__(self, data_dir: str, data_dirim: Optional[str] = None,
                 split: str = "train", words_num: int = 18,
                 imsize: int = 256,
                 cache_name: str = "captions_face.pickle"):
        self.data_dir = data_dir
        self.data_dirim = data_dirim or data_dir
        self.split = split
        self.augment = split == "train"  # reference training transform
        self.words_num = words_num
        self.imsize = imsize

        cache = os.path.join(data_dir, cache_name)
        if os.path.isfile(cache):
            with open(cache, "rb") as f:
                x = pickle.load(f)
            (train_caps, test_caps, ix2w, w2ix,
             train_names, test_names) = x
            self.vocab = Vocab(ix2w, w2ix)
        else:
            train_tok, train_names = self.load_attr_captions(data_dir, True)
            test_tok, test_names = self.load_attr_captions(data_dir, False)
            train_caps, test_caps, self.vocab = build_dictionary(
                train_tok, test_tok)
            with open(cache, "wb") as f:
                pickle.dump([train_caps, test_caps, self.vocab.ixtoword,
                             self.vocab.wordtoix, train_names, test_names],
                            f, protocol=2)
        if split == "train":
            self.filenames, self.captions = train_names, train_caps
        else:
            self.filenames, self.captions = test_names, test_caps
        self.class_id = np.arange(len(self.filenames))

    @staticmethod
    def load_sentence_captions(data_dir: str, train: bool = True,
                               caps_per_image: int = 5):
        """Sentence-caption variant (= load_caps, datasets.py:1002-1026):
        caps.txt lines are '<7-char id>...\\t<sent1>|<sent2>|...'; 5 captions
        per image (cycled when fewer); the 'test' split is the reference's
        first-5-images slice. Faithful quirks: the reference chops exactly
        ONE trailing character per sentence (`[:-1]` — the period when
        present, the last LETTER otherwise), keeps ''-words from double
        spaces (they enter the vocab as real indices), and does NOT re-chop
        the cycled copies (they were processed in place on first visit)."""
        all_caps, names = [], []
        with open(os.path.join(data_dir, "caps.txt")) as f:
            for line in f:
                sents = line[line.find("\t") + 1:-1].split("|")
                names.append(line[:7] + "png")
                for i in range(caps_per_image):
                    if len(sents) > i:
                        sents[i] = sents[i][:-1].replace(",", "").lower()
                        words = sents[i].split(" ")
                    else:
                        words = sents[i % len(sents)].split(" ")
                    all_caps.append(words)
        if not train:
            all_caps = all_caps[: 5 * caps_per_image]
            names = names[:5]
        return all_caps, names

    @staticmethod
    def load_attr_captions(data_dir: str, train: bool):
        """Parse list_attr_celeba.txt (= load_captions,
        datasets.py:934-961): header line of attribute names; per-image
        tokens = attribute names set to '1'; split on attr[11] (Blurry)."""
        all_caps, names = [], []
        path = os.path.join(data_dir, "list_attr_celeba.txt")
        with open(path) as f:
            lines = f.readlines()
        attr_list = lines[0].split(" ")[:-1]
        # faithful split (datasets.py:946-959): train keeps ONLY
        # attr[11] == '0', test ONLY attr[11] == '1'; rows with any other
        # value (e.g. '-1' in stock CelebA attr files, which use -1/1)
        # are dropped from BOTH splits, exactly as the reference does
        want = "1" if not train else "0"
        for line in lines[1:]:
            attr = line.split(" ")
            if len(attr) < 2:
                continue
            if attr[11] != want:
                continue
            names.append(attr[0][:-3] + "png")
            toks = [attr_list[i - 1] for i in range(1, len(attr))
                    if attr[i] in ("1", "1\n")]
            all_caps.append(toks)
        return all_caps, names

    def _image(self, index, rng=None):
        # train augmentation uses the driver transform's 76/64 enlarge
        # (pretrain_DAMSM.py:237-240); the deterministic eval path keeps
        # the example-test 72/64 center crop (datasets.py:1558-1561)
        return _load_and_resize(
            os.path.join(self.data_dirim, "Img", self.filenames[index]),
            self.imsize, enlarge=76 / 64 if rng is not None else 72 / 64,
            rng=rng)


class TextFlowerDataset(_CaptionDatasetBase):
    """Oxford-102 (= datasets.py:1146-1345): per-class text_c10/class_*/
    caption dirs; last 3 files per class are the test split."""

    def __init__(self, data_dir: str, split: str = "train",
                 words_num: int = 18, imsize: int = 256,
                 embeddings_num: int = 10,
                 cache_name: str = "captions_flower_v2.pickle"):
        # cache v2: the round-4 '{}'-caption fix changed _scan's output
        # (a '{}' first line now duplicates the previous file's caption
        # instead of being dropped), so caches written by the old scan
        # carry misaligned flat-caption addressing; a new default name
        # forces a rescan rather than silently loading a stale layout
        self.data_dir = data_dir
        self.split = split
        self.augment = split == "train"  # reference training transform
        self.words_num = words_num
        self.imsize = imsize
        self.embeddings_num = embeddings_num
        cache = os.path.join(data_dir, cache_name)
        if os.path.isfile(cache):
            with open(cache, "rb") as f:
                x = pickle.load(f)
            (train_caps, test_caps, ix2w, w2ix, train_names, test_names,
             train_cls, test_cls) = x
            self.vocab = Vocab(ix2w, w2ix)
        else:
            (train_tok, train_names, train_cls,
             test_tok, test_names, test_cls) = self._scan(data_dir)
            train_caps, test_caps, self.vocab = build_dictionary(
                train_tok, test_tok)
            with open(cache, "wb") as f:
                pickle.dump([train_caps, test_caps, self.vocab.ixtoword,
                             self.vocab.wordtoix, train_names, test_names,
                             train_cls, test_cls], f, protocol=2)
        if split == "train":
            self.filenames, self.captions = train_names, train_caps
            self.class_id = np.asarray(train_cls)
        else:
            # reference eval protocol (datasets.py:1294-1296): one image
            # per class triple (filenames[::3]) with ONE deterministic
            # caption per kept image (flat captions[::embeddings_num*3];
            # __getitem__ uses new_sent_ix = index, datasets.py:1341) —
            # embeddings_num=1 reproduces that addressing here
            self.filenames = test_names[::3]
            self.captions = test_caps[::self.embeddings_num * 3]
            self.class_id = np.asarray(test_cls[::3])
            self.embeddings_num = 1

    def _scan(self, data_dir):
        train_tok, train_names, train_cls = [], [], []
        test_tok, test_names, test_cls = [], [], []
        last_cap = None  # reference keeps ONE flat list; '{}' on a file's
        # first line duplicates the PREVIOUS FILE's last caption
        root = os.path.join(data_dir, "text_c10")
        for cls_dir in sorted(os.listdir(root)):
            m = re.match(r"class_(\d+)", cls_dir)
            if not m:
                continue
            cls = int(m.group(1))
            files = sorted(
                f for f in os.listdir(os.path.join(root, cls_dir))
                if f.endswith(".txt"))
            for i, fn in enumerate(files):
                is_test = i >= len(files) - 3  # last 3 per class = test
                with open(os.path.join(root, cls_dir, fn), "rb") as f:
                    caps = f.read().decode("utf8").split("\n")
                toks = []
                for cap in caps:
                    if cap == "{}":
                        # reference quirk (datasets.py:1201-1205): a '{}'
                        # placeholder line DUPLICATES the previous caption
                        # (the previous FILE's last one when it opens a
                        # file) so every file still yields embeddings_num
                        # captions — skipping it instead would misalign
                        # the flat index*embeddings_num caption addressing
                        # for every later image
                        prev = toks[-1] if toks else last_cap
                        if prev is not None:
                            toks.append(prev)
                    elif cap:
                        t = tokenize_caption(cap)
                        if t:
                            toks.append(t)
                    if toks:
                        last_cap = toks[-1]
                    if len(toks) == self.embeddings_num:
                        break
                name = fn[:-4]
                if is_test:
                    test_tok.extend(toks)
                    test_names.append(name)
                    test_cls.append(cls)
                else:
                    train_tok.extend(toks)
                    train_names.append(name)
                    train_cls.append(cls)
        return train_tok, train_names, train_cls, test_tok, test_names, test_cls

    def _image(self, index, rng=None):
        return _load_and_resize(
            f"{self.data_dir}/jpg/{self.filenames[index]}.jpg",
            self.imsize, enlarge=76 / 64, rng=rng)


class TextExampleSRDataset(_CaptionDatasetBase):
    """Eval-set dataset driven by a filename list + prebuilt caption pickle
    (= datasets.py:1551-1688). Used by the face x8 eval protocol with
    testset.pickle (captions, ixtoword, wordtoix)."""

    embeddings_num = 1

    def __init__(self, data_dir: str, caption_pickle: str,
                 image_subdir: str = "Img/changetxt_im1",
                 filenames: Optional[List[str]] = None,
                 words_num: int = 18, imsize: int = 256,
                 meaningless: bool = False):
        self.data_dir = data_dir
        self.image_subdir = image_subdir
        self.words_num = words_num
        self.imsize = imsize
        with open(caption_pickle, "rb") as f:
            caps, ix2w, w2ix = pickle.load(f)
        self.vocab = Vocab(ix2w, w2ix)
        if meaningless:
            # control experiment (= TextexampleSRDataset_meaningless,
            # datasets.py:1888-1972): constant token-1 caption
            caps = [[1] for _ in caps]
        self.captions = caps
        if filenames is None:
            img_dir = os.path.join(data_dir, image_subdir)
            attr_txt = os.path.join(data_dir, "testset.txt")
            if os.path.isdir(img_dir):
                filenames = sorted(os.listdir(img_dir))[: len(caps)]
            elif os.path.isfile(attr_txt):
                # derive image names from the attr table (caption order):
                # train rows first, then test rows -- matching the caption
                # pickle built by gen_example_pickle
                with open(attr_txt) as f:
                    lines = f.readlines()[1:]
                tr, te = [], []
                for line in lines:
                    attr = line.split(" ")
                    if len(attr) < 2:
                        continue
                    (te if attr[11] == "1" else tr).append(
                        attr[0][:-3] + "png")
                filenames = (tr + te)[: len(caps)]
            else:
                filenames = [f"{i:06d}.png" for i in range(len(caps))]
            # partial snapshots (e.g. the reference ships ONE test image for
            # thousands of attr rows): keep only caption/file pairs whose
            # image exists, so the eval loop can run on whatever is present
            present = [i for i, fn in enumerate(filenames)
                       if os.path.exists(os.path.join(data_dir, image_subdir,
                                                      fn))
                       or os.path.exists(os.path.join(data_dir, fn))]
            if present and len(present) < len(filenames):
                import warnings

                warnings.warn(
                    f"TextExampleSRDataset: {len(filenames) - len(present)}"
                    f"/{len(filenames)} listed images missing under "
                    f"{data_dir}; evaluating the {len(present)} present")
                filenames = [filenames[i] for i in present]
                self.captions = [self.captions[i] for i in present
                                 if i < len(self.captions)]
        self.filenames = filenames
        self.class_id = np.arange(len(self.filenames))

    def _image(self, index, rng=None):
        path = os.path.join(self.data_dir, self.image_subdir,
                            self.filenames[index])
        if not os.path.exists(path):
            path = os.path.join(self.data_dir, self.filenames[index])
        return _load_and_resize(path, self.imsize, enlarge=72 / 64)


class TextSRDataset(TextDataset):
    """SR training dataset (= datasets.py:504-903): TextDataset machinery
    with the captions5450.pickle cache name, optional stopword-filtered /
    color-word-only caption variants (datasets.py:597-692), and the test
    split pinned to caption 0 (datasets.py:893-896). The blur pyramids the
    reference builds per-sample (get_imgs_blur) come from the fused
    on-device preprocess (pipeline.device_preprocess(with_blur=True))."""

    def __init__(self, data_dir: str, split: str = "train",
                 words_num: int = 18, embeddings_num: int = 10,
                 imsize: int = 256, no_stopwords: bool = False,
                 only_color: bool = False):
        cache = "captions5450.pickle"
        if no_stopwords:
            cache = "captions5450_nostop.pickle"
        if only_color:
            cache = "captions5450_color.pickle"
        super().__init__(data_dir, split, words_num, embeddings_num, imsize,
                         no_stopwords, only_color, cache_name=cache)

    def __getitem__(self, index, rng=None, sent_ix=None):
        if self.split != "train" and sent_ix is None:
            sent_ix = 0  # deterministic test caption (datasets.py:893-896)
        return super().__getitem__(index, rng, sent_ix)


class TextCocoDataset(TextDataset):
    """COCO adapter (= datasets.py:1348-1548): train2014/val2014 images."""

    def _image(self, index, rng=None):
        key = self.filenames[index]
        sub = "train2014" if self.split == "train" else "val2014"
        return _load_and_resize(f"{self.data_dir}/images/{sub}/{key}.jpg",
                                self.imsize, enlarge=76 / 64, rng=rng)


class TextSRGTDataset(_CaptionDatasetBase):
    """Pre-generated SR results + captions, for ranking/evaluation
    (= datasets.py:1721-1885). Two caption formats:
      face:  attr-table lines 'name|<attr flags>'
      other: 'name|caption text' lines
    """

    embeddings_num = 1

    def __init__(self, vocab: Vocab, data_dir: str, image_dir: str,
                 txt: str = "testset.txt", dataset: str = "bird",
                 words_num: int = 18, imsize: int = 256):
        self.vocab = vocab
        self.data_dir = data_dir
        self.image_dir = image_dir
        self.words_num = words_num
        self.imsize = imsize
        self.filenames: List[str] = []
        raw_caps: List[List[str]] = []
        path = os.path.join(data_dir, txt)
        with open(path) as f:
            lines = f.readlines()
        if dataset == "face":
            attr_list = lines[0].split(" ")[:-1]
            for line in lines[1:]:
                parts = line.split("|")
                if len(parts) < 2:
                    continue
                self.filenames.append(parts[0])
                attr = parts[1].split(" ")
                raw_caps.append([attr_list[i - 1] for i in range(1, len(attr))
                                 if attr[i] in ("1", "1\n")])
        else:
            for line in lines:
                line = line.strip()
                if not line:
                    continue
                parts = line.split("|")
                self.filenames.append(parts[0])
                raw_caps.append(tokenize_caption(parts[1] if len(parts) > 1
                                                 else ""))
        self.captions = [vocab.encode_tokens(t) for t in raw_caps]
        self.class_id = np.arange(len(self.filenames))

    def _image(self, index, rng=None):
        img = _load_image_rgb(os.path.join(self.image_dir,
                                           self.filenames[index]))
        # = transforms.CenterCrop(imsize) with no resize (datasets.py:1726).
        # torchvision CenterCrop zero-PADS dimensions smaller than imsize
        # (crop of a padded canvas), so results below imsize batch cleanly
        # instead of crashing the first stacking consumer (cli.eval_rank).
        h, w = img.shape[:2]
        if h < self.imsize or w < self.imsize:
            canvas = np.zeros((max(h, self.imsize), max(w, self.imsize), 3),
                              img.dtype)
            top, left = (canvas.shape[0] - h) // 2, (canvas.shape[1] - w) // 2
            canvas[top:top + h, left:left + w] = img
            img = canvas
            h, w = img.shape[:2]
        top = max(0, (h - self.imsize) // 2)
        left = max(0, (w - self.imsize) // 2)
        return img[top:top + self.imsize, left:left + self.imsize]


def prepare_batch(examples: Sequence[Example]) -> Dict[str, np.ndarray]:
    """Collate host examples -> numpy batch. Replaces prepare_data
    (datasets.py:33-68); no sort-by-length (the masked-scan encoder does
    not require it), no per-field GPU moves (the jitted preprocess takes
    the whole batch at once)."""
    return {
        "hr": np.stack([e.hr for e in examples]),
        "captions": np.stack([e.tokens for e in examples]),
        "cap_lens": np.asarray([e.length for e in examples], np.int32),
        "class_ids": np.asarray([e.class_id for e in examples], np.int32),
        "keys": [e.key for e in examples],
    }


def load_arbitrary_eval_image(path_or_img, scale: int):
    """Arbitrary-size eval image prep (= get_imgsexampletest,
    datasets.py:200-233, and its coco scale-4 use at datasets.py:1548):
    crop H, W DOWN to multiples of `scale` (top-left anchored, as the
    reference's img.crop([0, 0, w, h])), produce the LR input by PIL
    bilinear downscale (= transforms.Resize).

    Returns (lr [1, h/scale, w/scale, 3] float32 in [-1, 1],
             gt [H, W, 3] uint8 cropped ground truth).
    """
    from PIL import Image

    img = (path_or_img if isinstance(path_or_img, Image.Image)
           else Image.open(path_or_img).convert("RGB"))
    w, h = img.size
    h2, w2 = (h // scale) * scale, (w // scale) * scale
    img = img.crop((0, 0, w2, h2))
    lr = img.resize((w2 // scale, h2 // scale), Image.BILINEAR)
    gt = np.asarray(img, np.uint8)
    lr = np.asarray(lr, np.float32) / 127.5 - 1.0
    return lr[None], gt
