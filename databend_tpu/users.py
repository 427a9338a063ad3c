"""RBAC: users, roles, grants.

Reference analog: src/query/users (UserApiProvider, role cache, grant
checks — 6,881 LoC) and src/meta/app user/role types. Users and roles live
in the meta KV under ``users/`` and ``roles/``; passwords are sha256
(double-sha mirrors MySQL-compatible auth in the reference).

Privileges: SELECT, INSERT, DELETE, UPDATE, CREATE, DROP, ALTER, SUPER,
ALL. Objects: global ``*.*``, database ``db.*``, table ``db.t``. The
built-in ``root`` user and ``account_admin`` role hold ALL on ``*.*``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from .errors import _err

AuthenticateFailure = _err("AuthenticateFailure", 1045)
UnknownUser = _err("UnknownUser", 2201)
UnknownRole = _err("UnknownRole", 2204)
PermissionDenied = _err("PermissionDenied", 1063)
IllegalGrant = _err("IllegalGrant", 2218)

PRIVILEGES = {"SELECT", "INSERT", "DELETE", "UPDATE", "CREATE", "DROP",
              "ALTER", "SUPER", "ALL"}
BUILTIN_ADMIN_ROLE = "account_admin"


def hash_password(pw: str) -> str:
    return hashlib.sha256(pw.encode("utf-8")).hexdigest()


@dataclass
class GrantEntry:
    privileges: Set[str]
    database: str  # "*" = all
    table: str     # "*" = all

    def covers(self, priv: str, db: str, table: str) -> bool:
        if priv not in self.privileges and "ALL" not in self.privileges:
            return False
        if self.database != "*" and self.database.lower() != db.lower():
            return False
        if self.table != "*" and self.table.lower() != table.lower():
            return False
        return True

    def to_dict(self):
        return {"privileges": sorted(self.privileges),
                "database": self.database, "table": self.table}

    @staticmethod
    def from_dict(d):
        return GrantEntry(set(d["privileges"]), d["database"], d["table"])


@dataclass
class UserInfo:
    name: str
    password_sha256: Optional[str] = None
    roles: List[str] = field(default_factory=list)
    grants: List[GrantEntry] = field(default_factory=list)

    def to_dict(self):
        return {"name": self.name, "password_sha256": self.password_sha256,
                "roles": self.roles,
                "grants": [g.to_dict() for g in self.grants]}

    @staticmethod
    def from_dict(d):
        return UserInfo(d["name"], d.get("password_sha256"),
                        list(d.get("roles", [])),
                        [GrantEntry.from_dict(g) for g in d.get("grants", [])])


@dataclass
class RoleInfo:
    name: str
    grants: List[GrantEntry] = field(default_factory=list)

    def to_dict(self):
        return {"name": self.name, "grants": [g.to_dict() for g in self.grants]}

    @staticmethod
    def from_dict(d):
        return RoleInfo(d["name"],
                        [GrantEntry.from_dict(g) for g in d.get("grants", [])])


class UserManager:
    """CRUD + grant checks over the meta KV (reference UserApiProvider)."""

    def __init__(self, meta):
        self.meta = meta
        if self.get_role(BUILTIN_ADMIN_ROLE) is None:
            self._put_role(RoleInfo(BUILTIN_ADMIN_ROLE,
                                    [GrantEntry({"ALL"}, "*", "*")]))
        if self.get_user("root") is None:
            self.meta.upsert("users/root", UserInfo(
                "root", None, [BUILTIN_ADMIN_ROLE]).to_dict())

    # ------------------------------------------------------------- users
    def create_user(self, name: str, password: Optional[str],
                    if_not_exists: bool = False):
        key = f"users/{name.lower()}"
        cur, _ = self.meta.get(key)
        if cur is not None:
            if if_not_exists:
                return
            raise IllegalGrant(f"user {name!r} already exists")
        pw = hash_password(password) if password else None
        self.meta.upsert(key, UserInfo(name.lower(), pw).to_dict())

    def drop_user(self, name: str, if_exists: bool = False):
        key = f"users/{name.lower()}"
        cur, _ = self.meta.get(key)
        if cur is None:
            if if_exists:
                return
            raise UnknownUser(f"unknown user {name!r}")
        if name.lower() == "root":
            raise IllegalGrant("cannot drop the root user")
        self.meta.delete(key)

    def get_user(self, name: str) -> Optional[UserInfo]:
        v, _ = self.meta.get(f"users/{name.lower()}")
        return UserInfo.from_dict(v) if v is not None else None

    def list_users(self) -> List[UserInfo]:
        return [UserInfo.from_dict(v) for _, v, _ in self.meta.list_prefix("users/")]

    def authenticate(self, name: str, password: Optional[str]) -> UserInfo:
        u = self.get_user(name)
        if u is None:
            raise AuthenticateFailure(f"unknown user {name!r}")
        if u.password_sha256 is not None:
            if password is None or hash_password(password) != u.password_sha256:
                raise AuthenticateFailure(f"wrong password for {name!r}")
        return u

    # ------------------------------------------------------------- roles
    def _put_role(self, role: RoleInfo):
        self.meta.upsert(f"roles/{role.name.lower()}", role.to_dict())

    def create_role(self, name: str, if_not_exists: bool = False):
        v, _ = self.meta.get(f"roles/{name.lower()}")
        if v is not None:
            if if_not_exists:
                return
            raise IllegalGrant(f"role {name!r} already exists")
        self._put_role(RoleInfo(name.lower()))

    def drop_role(self, name: str, if_exists: bool = False):
        if name.lower() == BUILTIN_ADMIN_ROLE:
            raise IllegalGrant("cannot drop built-in role")
        v, _ = self.meta.get(f"roles/{name.lower()}")
        if v is None:
            if if_exists:
                return
            raise UnknownRole(f"unknown role {name!r}")
        self.meta.delete(f"roles/{name.lower()}")

    def get_role(self, name: str) -> Optional[RoleInfo]:
        v, _ = self.meta.get(f"roles/{name.lower()}")
        return RoleInfo.from_dict(v) if v is not None else None

    def list_roles(self) -> List[RoleInfo]:
        return [RoleInfo.from_dict(v) for _, v, _ in self.meta.list_prefix("roles/")]

    # ------------------------------------------------------------- grants
    def grant(self, privileges: Set[str], db: str, table: str,
              to_role: Optional[str] = None, to_user: Optional[str] = None):
        bad = privileges - PRIVILEGES
        if bad:
            raise IllegalGrant(f"unknown privileges {sorted(bad)}")
        entry = GrantEntry(privileges, db, table)
        if to_role is not None:
            role = self.get_role(to_role)
            if role is None:
                raise UnknownRole(f"unknown role {to_role!r}")
            role.grants.append(entry)
            self._put_role(role)
        else:
            user = self.get_user(to_user)
            if user is None:
                raise UnknownUser(f"unknown user {to_user!r}")
            user.grants.append(entry)
            self.meta.upsert(f"users/{user.name}", user.to_dict())

    def grant_role(self, role: str, to_user: str):
        if self.get_role(role) is None:
            raise UnknownRole(f"unknown role {role!r}")
        user = self.get_user(to_user)
        if user is None:
            raise UnknownUser(f"unknown user {to_user!r}")
        if role.lower() not in user.roles:
            user.roles.append(role.lower())
            self.meta.upsert(f"users/{user.name}", user.to_dict())

    def revoke(self, privileges: Set[str], db: str, table: str,
               from_role: Optional[str] = None, from_user: Optional[str] = None):
        def strip(grants):
            out = []
            for g in grants:
                if g.database == db and g.table == table:
                    g = GrantEntry(g.privileges - privileges, g.database, g.table)
                    if "ALL" in privileges:
                        continue
                if g.privileges:
                    out.append(g)
            return out
        if from_role is not None:
            role = self.get_role(from_role)
            if role is None:
                raise UnknownRole(f"unknown role {from_role!r}")
            role.grants = strip(role.grants)
            self._put_role(role)
        else:
            user = self.get_user(from_user)
            if user is None:
                raise UnknownUser(f"unknown user {from_user!r}")
            user.grants = strip(user.grants)
            self.meta.upsert(f"users/{user.name}", user.to_dict())

    def effective_grants(self, user: UserInfo) -> List[GrantEntry]:
        out = list(user.grants)
        for r in user.roles:
            role = self.get_role(r)
            if role is not None:
                out.extend(role.grants)
        return out

    def check(self, user: UserInfo, priv: str, db: str, table: str = "*"):
        for g in self.effective_grants(user):
            if g.covers(priv, db, table):
                return
        raise PermissionDenied(
            f"user {user.name!r} lacks {priv} on {db}.{table}")
