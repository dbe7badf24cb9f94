"""Region-recognition eval mechanics with a mocked chat session."""

import numpy as np

from gpt4roi_tpu.eval.region_eval import evaluate_region_recognition, match_category


def test_match_category_longest_first():
    names = ["baseball glove", "baseball bat", "cat"]
    assert match_category("I see a baseball bat here", names) == 1
    assert match_category("A CAT.", names) == 2
    assert match_category("nothing", names) is None


class MockSession:
    """Answers the true class for even boxes, garbage for odd ones."""

    def __init__(self, class_names):
        self.class_names = class_names
        self.boxes = []
        self._entry_labels = None
        self._k = 0

    def reset(self):
        self.boxes = []
        self._k = 0

    def set_image(self, img):
        pass

    def add_boxes(self, boxes, hw):
        self.boxes.extend(boxes)

    def ask(self, q):
        label = self._entry_labels[self._k]
        self._k += 1
        if (self._k - 1) % 2 == 0:
            return f"It is a {self.class_names[label]}."
        return "I have no idea"


class MockDataset:
    begin_str = "categories...\n"

    def __init__(self, entries, session):
        self.entries = entries
        self._session = session

    def load_image(self, entry):
        # hand the mock session this entry's ground truth
        self._session._entry_labels = entry["labels"]
        return np.zeros((32, 32, 3), np.uint8)


def test_eval_loop():
    names = ["cat", "dog", "car"]
    entries = [
        {"boxes": np.array([[1, 1, 5, 5], [2, 2, 8, 8]]), "labels": [0, 2]},
        {"boxes": np.array([[1, 1, 5, 5], [2, 2, 8, 8]]), "labels": [1, 1]},
    ]
    sess = MockSession(names)
    ds = MockDataset(entries, sess)
    stats = evaluate_region_recognition(sess, ds, names)
    assert stats["total"] == 4
    assert stats["parsed"] == 2  # every other answer parseable
    assert stats["accuracy"] == 0.5  # the parseable ones are correct
    assert stats["parse_rate"] == 0.5
