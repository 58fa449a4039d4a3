"""``fake(...)`` value generation — parity with the reference's faker
surface (internal/impl/lang/bloblang.go:59-241, backed by
go-faker/faker). Every documented function name is supported and
returns a value of the same TYPE and textual SHAPE as go-faker (the
values themselves are random, as in the reference); unknown names
raise ``invalid faker function: <name>`` like GetFakeValue's tail.

No faker library exists in this sandbox, so the generators are small
self-contained samplers over public wordlists/formats.
"""

from __future__ import annotations

import random
import time
import uuid

_WORDS = (
    "alias consequatur aut perferendis sit voluptatem accusantium "
    "doloremque aperiam eaque ipsa quae ab illo inventore veritatis "
    "quasi architecto beatae vitae dicta sunt explicabo aspernatur "
    "odit fugit sed quia consequuntur magni dolores eos qui ratione "
    "voluptatem sequi nesciunt neque porro quisquam est dolorem"
).split()
_MONTHS = ["January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December"]
_DAYS = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
         "Friday", "Saturday"]
_CENTURIES = ["I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX",
              "X", "XI", "XII", "XIII", "XIV", "XV", "XVI", "XVII",
              "XVIII", "XIX", "XX", "XXI"]
_TIMEZONES = ["America/New_York", "America/Los_Angeles", "Europe/London",
              "Europe/Berlin", "Asia/Jakarta", "Asia/Tokyo",
              "Australia/Sydney", "Africa/Cairo", "America/Sao_Paulo",
              "Asia/Kolkata", "UTC"]
_TLDS = ["com", "net", "org", "io", "biz", "info"]
_CC_TYPES = ["VISA", "MasterCard", "American Express", "Discover",
             "JCB", "Diners Club"]
_CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CNY", "INR", "BRL", "CAD",
               "AUD", "CHF"]
_FIRST_M = ["James", "Robert", "John", "Michael", "David", "William",
            "Richard", "Joseph", "Thomas", "Christopher"]
_FIRST_F = ["Mary", "Patricia", "Jennifer", "Linda", "Elizabeth",
            "Barbara", "Susan", "Jessica", "Sarah", "Karen"]
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
         "Miller", "Davis", "Rodriguez", "Martinez"]
_CN_FIRST = ["伟", "芳", "娜", "敏", "静", "丽", "强", "磊", "军", "洋"]
_CN_LAST = ["王", "李", "张", "刘", "陈", "杨", "黄", "赵", "吴", "周"]
_B64URL = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
           "abcdefghijklmnopqrstuvwxyz0123456789-_")


def _word(rng) -> str:
    return rng.choice(_WORDS)


def _letters(rng, n: int, alphabet: str = "abcdefghijklmnopqrstuvwxyz"
             ) -> str:
    return "".join(rng.choice(alphabet) for _ in range(n))


def _sentence(rng) -> str:
    n = rng.randint(5, 12)
    words = [_word(rng) for _ in range(n)]
    return " ".join(words).capitalize() + "."


def _domain(rng) -> str:
    return f"{_word(rng)}.{rng.choice(_TLDS)}"


def _rand_epoch(rng) -> float:
    return rng.uniform(0, time.time())


def _fmt_time(sec: float, fmt: str) -> str:
    return time.strftime(fmt, time.gmtime(sec))


def get_fake_value(function: str, rng: random.Random | None = None):
    """Mirror of GetFakeValue (bloblang.go:128-241)."""
    rng = rng or random
    f = function.lower()

    # location
    if f == "latitude":
        return float(rng.uniform(-90, 90))
    if f == "longitude":
        return float(rng.uniform(-180, 180))

    # date / time
    if f == "unix_time":
        return int(_rand_epoch(rng))
    if f == "date":
        return _fmt_time(_rand_epoch(rng), "%Y-%m-%d")
    if f == "time_string":
        return _fmt_time(_rand_epoch(rng), "%H:%M:%S")
    if f == "month_name":
        return rng.choice(_MONTHS)
    if f == "year_string":
        return str(rng.randint(1970, 2100))
    if f == "day_of_week":
        return rng.choice(_DAYS)
    if f == "day_of_month":
        return str(rng.randint(1, 28))
    if f == "timestamp":
        return _fmt_time(_rand_epoch(rng), "%Y-%m-%d %H:%M:%S")
    if f == "century":
        return rng.choice(_CENTURIES)
    if f == "timezone":
        return rng.choice(_TIMEZONES)
    if f == "time_period":
        return rng.choice(["AM", "PM"])

    # internet
    if f == "email":
        return f"{_letters(rng, 8)}@{_domain(rng)}"
    if f == "mac_address":
        return ":".join(f"{rng.randint(0, 255):02x}" for _ in range(6))
    if f == "domain_name":
        return _domain(rng)
    if f == "url":
        return f"https://www.{_domain(rng)}/{_word(rng)}/{_word(rng)}"
    if f == "username":
        return _letters(rng, rng.randint(6, 12))
    if f == "ipv4":
        return ".".join(str(rng.randint(0, 255)) for _ in range(4))
    if f == "ipv6":
        return ":".join(f"{rng.randint(0, 0xFFFF):04x}"
                        for _ in range(8))
    if f == "password":
        return _letters(rng, 50,
                        "abcdefghijklmnopqrstuvwxyz"
                        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    if f == "jwt":
        return ".".join(_letters(rng, n, _B64URL) for n in (36, 64, 43))

    # words
    if f == "word":
        return _word(rng)
    if f == "sentence":
        return _sentence(rng)
    if f == "paragraph":
        return " ".join(_sentence(rng) for _ in range(rng.randint(3, 6)))

    # payment
    if f == "cc_type":
        return rng.choice(_CC_TYPES)
    if f == "cc_number":
        return "".join(str(rng.randint(0, 9)) for _ in range(16))
    if f == "currency":
        return rng.choice(_CURRENCIES)
    if f == "amount_with_currency":
        return f"{rng.choice(_CURRENCIES)} {rng.uniform(1, 100000):.2f}"

    # person
    if f == "title_male":
        return "Mr."
    if f == "title_female":
        return rng.choice(["Mrs.", "Ms.", "Miss"])
    if f == "first_name":
        return rng.choice(_FIRST_M + _FIRST_F)
    if f == "first_name_male":
        return rng.choice(_FIRST_M)
    if f == "first_name_female":
        return rng.choice(_FIRST_F)
    if f == "last_name":
        return rng.choice(_LAST)
    if f == "name":
        return (f"{rng.choice(['Mr.', 'Mrs.', 'Ms.', 'Dr.'])} "
                f"{rng.choice(_FIRST_M + _FIRST_F)} {rng.choice(_LAST)}")
    if f == "gender":
        return rng.choice(["Male", "Female"])
    if f == "chinese_first_name":
        return rng.choice(_CN_FIRST)
    if f == "chinese_last_name":
        return rng.choice(_CN_LAST)
    if f == "chinese_name":
        return rng.choice(_CN_LAST) + rng.choice(_CN_FIRST)

    # phone
    if f == "phone_number":
        return (f"{rng.randint(100, 999)}-{rng.randint(100, 999)}-"
                f"{rng.randint(1000, 9999)}")
    if f == "toll_free_phone_number":
        return (f"(8{rng.randint(0, 9)}{rng.randint(0, 9)}) "
                f"{rng.randint(100, 999)}-{rng.randint(1000, 9999)}")
    if f == "e164_phone_number":
        return f"+{rng.randint(10000000000, 99999999999)}"

    # uuid
    if f == "uuid_hyphenated":
        return str(uuid.UUID(int=rng.getrandbits(128), version=4))
    if f == "uuid_digit":
        return uuid.UUID(int=rng.getrandbits(128), version=4).hex

    if f == "":
        # faker.FakeData(&str): a random latin string
        return _letters(rng, rng.randint(10, 25))

    raise ValueError(f"invalid faker function: {function}")
