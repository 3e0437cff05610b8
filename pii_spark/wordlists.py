"""Closed vocabularies for the deterministic corpus generator.

The reference uses Faker("en_US") locale data (pii_synth/generation.py:21).
Offline we ship our own closed word lists; the detector's gazetteers are
built from these same lists — which is semantically faithful: the
reference's RoBERTa model memorized Faker's vocabulary from the synthetic
training set (that is why its synthetic F1 is 99% while real-world F1 is
37%, README.md:221,251).

FILLER_EN (used for O-only prose, generation.py:831-840 analogue) is kept
*disjoint* from every PII vocabulary so that noise cannot turn filler into
a gazetteer hit; tests/test_wordlists.py asserts this.
"""

from __future__ import annotations

FIRST_NAMES = (
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "karen", "charles", "sarah", "christopher",
    "lisa", "daniel", "nancy", "matthew", "betty", "anthony", "sandra",
    "mark", "margaret", "donald", "ashley", "steven", "kimberly", "andrew",
    "emily", "paul", "donna", "joshua", "michelle", "kenneth", "carol",
    "kevin", "amanda", "brian", "melissa", "george", "deborah", "timothy",
    "stephanie", "ronald", "rebecca", "jason", "sharon", "edward", "laura",
    "jeffrey", "cynthia", "ryan", "kathleen", "jacob", "amy", "gary",
    "angela", "nicholas", "shirley", "eric", "brenda", "jonathan", "emma",
    "stephen", "anna", "larry", "pamela", "justin", "nicole", "scott",
    "samantha", "brandon", "katherine", "benjamin", "christine", "gregory",
    "debra", "samuel", "rachel", "frank", "carolyn", "patrick", "janet",
    "raymond", "maria", "alexander", "olivia", "jack", "heather", "dennis",
    "helen", "jerry", "catherine", "tyler", "diane", "aaron", "julie",
    "jose", "victoria", "adam", "joyce", "nathan", "lauren", "henry",
    "kelly", "zachary", "christina", "douglas", "ruth", "peter", "joan",
    "kyle", "virginia", "noah", "judith", "ethan", "evelyn", "jeremy",
    "hannah", "walter", "andrea", "keith", "megan", "austin", "cheryl",
    "roger", "jacqueline", "terry", "madison", "sean", "teresa", "gerald",
    "abigail", "carl", "sophia", "dylan", "martha", "harold", "sara",
    "jordan", "gloria", "jesse", "janice", "bryan", "kathryn", "lawrence",
    "ann", "arthur", "isabella", "gabriel", "judy", "bruce", "charlotte",
    "logan", "julia", "billy", "grace", "joe", "amber", "alan", "alice",
    "juan", "jean", "elijah", "denise", "willie", "frances", "albert",
    "danielle", "wayne", "marilyn", "randy", "natalie", "mason", "beverly",
    "vincent", "diana", "liam", "brittany", "roy", "theresa", "bobby",
    "kayla", "caleb", "alexis", "bradley", "doris", "russell", "lori",
    "lucas", "tiffany",
)

LAST_NAMES = (
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "taylor", "moore", "jackson", "martin", "lee",
    "perez", "thompson", "white", "harris", "sanchez", "clark", "ramirez",
    "lewis", "robinson", "walker", "young", "allen", "king", "wright",
    "torres", "nguyen", "hill", "flores", "green", "adams", "nelson",
    "baker", "hall", "rivera", "campbell", "mitchell", "carter", "roberts",
    "gomez", "phillips", "evans", "turner", "diaz", "parker", "cruz",
    "edwards", "collins", "reyes", "stewart", "morris", "morales", "murphy",
    "cook", "rogers", "gutierrez", "ortiz", "morgan", "cooper", "peterson",
    "bailey", "reed", "kelley", "howard", "ramos", "kim", "cox", "ward",
    "richardson", "watson", "brooks", "chavez", "wood", "bennett", "gray",
    "mendoza", "ruiz", "hughes", "price", "alvarez", "castillo", "sanders",
    "patel", "myers", "long", "ross", "foster", "jimenez", "powell",
    "jenkins", "perry", "russell", "sullivan", "bell", "coleman", "butler",
    "henderson", "barnes", "fisher", "vasquez", "simmons", "romero",
    "jordan", "patterson", "alexander", "hamilton", "graham", "reynolds",
    "griffin", "wallace", "moreno", "west", "cole", "hayes", "bryant",
    "herrera", "gibson", "ellis", "tran", "medina", "aguilar", "stevens",
    "murray", "ford", "castro", "marshall", "owens", "harrison", "fernandez",
    "mcdonald", "woods", "washington", "kennedy", "wells", "vargas", "henry",
    "chen", "freeman", "webb", "tucker", "guzman", "burns", "crawford",
    "olson", "simpson", "porter", "hunter", "gordon", "mendez", "silva",
    "shaw", "snyder", "mason", "dixon", "munoz", "hunt", "hicks", "holmes",
    "palmer", "wagner", "black", "robertson", "boyd", "rose", "stone",
    "salazar", "fox", "warren", "mills", "meyer", "rice", "schmidt",
)

CITIES = (
    "Springfield", "Riverton", "Fairview", "Kingsport", "Lakeside",
    "Brookhaven", "Maplewood", "Cedarville", "Ashford", "Greenfield",
    "Oakmont", "Pinehurst", "Elmwood", "Clearwater", "Stonebridge",
    "Westfield", "Northgate", "Southport", "Easton", "Harborview",
    "Millbrook", "Foxcrest", "Glenville", "Hartsdale", "Ironwood",
    "Junction City", "Kelton", "Larkspur", "Monroe Falls", "Newbury",
    "Ortonville", "Pelham", "Quailwood", "Redstone", "Sablecrest",
    "Thornfield", "Umberton", "Vailmont", "Wexford", "Yarrow Bay",
    "Zephyr Hills", "Bridgewater", "Crestline", "Dunmore", "Eastvale",
    "Fernridge", "Graystone", "Hollybrook", "Inverloch", "Jasperville",
    "Kentwood", "Loganberry", "Midvale", "Norcross", "Ocean Bluff",
    "Pinnacle", "Quarrytown", "Rosemont", "Silverlake", "Trentham",
)

STREET_FIRST = (
    "Main", "Oak", "Maple", "Cedar", "Pine", "Elm", "Washington", "Lake",
    "Hill", "Park", "Walnut", "Spring", "North", "Ridge", "Church",
    "Willow", "Mill", "Sunset", "Railroad", "Jefferson", "Highland",
    "Forest", "Meadow", "Chestnut", "Franklin", "River", "Spruce",
    "Sycamore", "Birch", "Dogwood", "Hickory", "Juniper", "Laurel",
    "Magnolia", "Poplar", "Aspen", "Cypress", "Hawthorn", "Linden",
    "Mulberry",
)

STREET_SUFFIXES = (
    "Street", "Avenue", "Road", "Lane", "Drive", "Boulevard", "Court",
    "Place", "Terrace", "Way",
)

# (full name, USPS-style abbreviation)
STATES = (
    ("Alabama", "AL"), ("Alaska", "AK"), ("Arizona", "AZ"),
    ("Arkansas", "AR"), ("California", "CA"), ("Colorado", "CO"),
    ("Connecticut", "CT"), ("Delaware", "DE"), ("Florida", "FL"),
    ("Georgia", "GA"), ("Hawaii", "HI"), ("Idaho", "ID"),
    ("Illinois", "IL"), ("Indiana", "IN"), ("Iowa", "IA"),
    ("Kansas", "KS"), ("Kentucky", "KY"), ("Louisiana", "LA"),
    ("Maine", "ME"), ("Maryland", "MD"), ("Massachusetts", "MA"),
    ("Michigan", "MI"), ("Minnesota", "MN"), ("Mississippi", "MS"),
    ("Missouri", "MO"), ("Montana", "MT"), ("Nebraska", "NE"),
    ("Nevada", "NV"), ("New Hampshire", "NH"), ("New Jersey", "NJ"),
    ("New Mexico", "NM"), ("New York", "NY"), ("North Carolina", "NC"),
    ("North Dakota", "ND"), ("Ohio", "OH"), ("Oklahoma", "OK"),
    ("Oregon", "OR"), ("Pennsylvania", "PA"), ("Rhode Island", "RI"),
    ("South Carolina", "SC"), ("South Dakota", "SD"), ("Tennessee", "TN"),
    ("Texas", "TX"), ("Utah", "UT"), ("Vermont", "VT"), ("Virginia", "VA"),
    ("Washington", "WA"), ("West Virginia", "WV"), ("Wisconsin", "WI"),
    ("Wyoming", "WY"),
)

# (full name, ISO-3166-ish alpha-2 code)
COUNTRIES = (
    ("United States", "US"), ("United Kingdom", "GB"), ("Canada", "CA"),
    ("Australia", "AU"), ("Germany", "DE"), ("France", "FR"),
    ("Spain", "ES"), ("Italy", "IT"), ("Netherlands", "NL"),
    ("Belgium", "BE"), ("Sweden", "SE"), ("Norway", "NO"),
    ("Denmark", "DK"), ("Finland", "FI"), ("Ireland", "IE"),
    ("Portugal", "PT"), ("Austria", "AT"), ("Switzerland", "CH"),
    ("Poland", "PL"), ("Czechia", "CZ"), ("Greece", "GR"),
    ("Hungary", "HU"), ("Romania", "RO"), ("Bulgaria", "BG"),
    ("Croatia", "HR"), ("Slovakia", "SK"), ("Slovenia", "SI"),
    ("Estonia", "EE"), ("Latvia", "LV"), ("Lithuania", "LT"),
    ("Japan", "JP"), ("Mexico", "MX"), ("Brazil", "BR"),
    ("Argentina", "AR"), ("Chile", "CL"), ("Colombia", "CO"),
    ("Peru", "PE"), ("India", "IN"), ("Singapore", "SG"),
    ("New Zealand", "NZ"), ("South Africa", "ZA"), ("Iceland", "IS"),
    ("Luxembourg", "LU"), ("Malta", "MT"), ("Cyprus", "CY"),
    ("Turkey", "TR"), ("Ukraine", "UA"), ("Serbia", "RS"),
    ("Albania", "AL"), ("Georgia", "GE"),
)

COMPANY_SUFFIXES = ("Inc", "LLC", "Group", "Ltd", "PLC", "and Sons", "Co")

EMAIL_DOMAINS = (
    "gmail.com", "yahoo.com", "outlook.com", "hotmail.com", "aol.com",
    "protonmail.com", "icloud.com",
)

# O-only English filler prose (stand-in for faker.paragraph, which emits
# latin lorem — divergence documented in SURVEY §7: English filler makes the
# language-ID stage meaningful on the web-text payload).
# DISJOINT from all PII vocabularies above (tests enforce).
FILLER_EN = (
    "the", "quick", "update", "arrived", "after", "lunch", "and",
    "everyone", "agreed", "that", "build", "was", "finally", "stable",
    "weather", "today", "seems", "cooler", "than", "yesterday", "with",
    "light", "rain", "expected", "later", "this", "evening", "meeting",
    "went", "well", "discussed", "features", "roadmap", "quarterly",
    "review", "project", "deadline", "approaching", "team", "almost",
    "done", "testing", "presentation", "received", "positive", "feedback",
    "from", "committee", "server", "not", "responding", "error", "code",
    "deployed", "successfully", "database", "query", "returned", "empty",
    "results", "homework", "finished", "weekend", "plans", "include",
    "hiking", "movie", "night", "restaurant", "nearby", "opened", "novel",
    "menu", "looks", "promising", "coffee", "tastes", "better", "when",
    "shared", "morning", "commute", "slower", "because", "roadwork",
    "library", "extended", "hours", "during", "exams", "garden", "needs",
    "watering", "twice", "week", "bicycle", "repair", "shop", "closed",
    "holidays", "concert", "tickets", "sold", "out", "within", "minutes",
    "recipe", "calls", "for", "fresh", "basil", "tomatoes", "practice",
    "session", "moved", "indoors", "due", "wind", "volunteers", "needed",
    "cleanup", "event", "saturday", "budget", "proposal", "under",
    "discussion", "board", "training", "materials", "updated", "portal",
    "password", "reset", "instructions", "sent", "inbox", "printer",
    "jammed", "again", "third", "floor", "lights", "flickering", "since",
    "storm", "report", "summarizes", "findings", "clearly", "chapter",
    "covers", "basics", "thoroughly", "draft", "ready", "comments",
    "welcome", "release", "notes", "mention", "several", "fixes",
)

# Non-English filler vocabularies for the langid stage.
LANG_WORDS = {
    "de": (
        "und", "der", "die", "das", "nicht", "mit", "auf", "für", "ist",
        "im", "dem", "ein", "eine", "als", "auch", "es", "an", "werden",
        "aus", "er", "hat", "dass", "sie", "nach", "wird", "bei", "einer",
        "um", "am", "sind", "noch", "wie", "einem", "über", "einen",
        "so", "zum", "war", "haben", "nur", "oder", "aber", "vor", "zur",
        "bis", "mehr", "durch", "man", "sein", "wurde", "sei", "wenn",
        "morgen", "heute", "gestern", "immer", "jahr", "zeit", "stadt",
    ),
    "fr": (
        "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je",
        "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au",
        "pour", "pas", "vous", "par", "sur", "faire", "plus", "dire",
        "me", "on", "mon", "lui", "nous", "comme", "mais", "pouvoir",
        "avec", "tout", "y", "aller", "voir", "bien", "où", "sans",
        "tu", "ou", "leur", "homme", "si", "deux", "mari", "moi",
        "toujours", "demain", "ville", "temps", "année", "jour",
    ),
    "es": (
        "el", "la", "de", "que", "y", "a", "en", "un", "ser", "se",
        "no", "haber", "por", "con", "su", "para", "como", "estar",
        "tener", "le", "lo", "todo", "pero", "más", "hacer", "o",
        "poder", "decir", "este", "ir", "otro", "ese", "si", "me",
        "ya", "ver", "porque", "dar", "cuando", "él", "muy", "sin",
        "vez", "mucho", "saber", "qué", "sobre", "mi", "alguno",
        "mismo", "yo", "también", "hasta", "ciudad", "tiempo", "año",
    ),
}

URL_PATH_WORDS = (
    "article", "post", "thread", "page", "entry", "story", "item", "view",
    "doc", "note", "archive", "blog", "forum", "wiki", "news", "review",
)

# Skewed domain pool: the first domain is "hot" (~30% of rows) to exercise
# the salted-repartition path (FIXTURES.md §1).
DOMAINS = (
    "bigforum.example.com",
    "news.example.org", "blog.example.net", "shop.example.io",
    "wiki.example.edu", "mail.example.co", "social.example.app",
    "videos.example.tv", "code.example.dev", "docs.example.info",
    "market.example.biz", "photos.example.gallery", "games.example.gg",
    "travel.example.tours", "food.example.kitchen", "music.example.fm",
)

STATE_ABBRS = frozenset(a for _, a in STATES)
COUNTRY_CODES = frozenset(c for _, c in COUNTRIES)
STATE_NAMES = frozenset(n for n, _ in STATES)
COUNTRY_NAMES = frozenset(n for n, _ in COUNTRIES)
